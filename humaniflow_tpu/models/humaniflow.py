"""HumaniflowModel: probabilistic SMPL shape/pose predictor, TPU-native.

Capability parity with reference `models/humaniflow_model.py:33` — ResNet
encoder over the 18-channel proxy representation, weak-perspective camera /
global-rotation / shape heads, and per-body-part ancestor-conditioned
normalizing flows on SO(3) — redesigned for XLA:

* The reference loops over 23 body parts sequentially (humaniflow_model.py:286)
  with per-part pyro modules.  The kinematic tree has depth 8, so here parts
  are grouped by tree depth: one fused, part-batched flow evaluation per depth
  level (8 steps instead of 23), each an MXU-friendly stacked matmul over
  batch × samples × parts-at-level.
* Per-part weights are stacked along a leading part axis; ancestor gathers are
  padded to MAX_ANCESTORS=7 with zero masks, so every shape is static and the
  whole forward jit-compiles once.
* Teacher-forced log-likelihood contexts (ancestors = ground truth) have no
  sequential dependency at all and are computed for all 23 parts in a single
  fused pass (the reference still loops, humaniflow_model.py:314).
* Instead of stateful "conditioned distribution" objects, the forward returns
  flow contexts; log-probabilities are computed functionally by
  `pose_log_prob` (flows/so3_flow.py) — no caching, no clear_cache.
"""

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.defaults import ModelConfig
from ..flows import pallas_level
from ..flows.factory import ConditionalFlow, create_conditional_norm_flow
from ..flows.so3_flow import SO3FlowDistribution
from ..ops.rotation import rot6d_to_rotmat, rotmat_to_rot6d
from ..ops.so3 import so3_exp
from .resnet import RESNET_FEAT_DIMS, resnet18, resnet50
from .smpl import SMPL_PARENTS

INIT_CAM = (0.9, 0.0, 0.0)  # orthographic scale init (reference :55)


def immediate_parent_to_all_ancestors(parents) -> Dict[int, List[int]]:
    """Per-bodypart ordered ancestor lists, excluding the root
    (reference: humaniflow_model.py:16-30; bodypart i = SMPL joint i+1)."""
    ancestors: Dict[int, List[int]] = {}
    for i in range(1, len(parents)):
        part = i - 1
        parent = parents[i] - 1
        ancestors[part] = ([parent] + ancestors[parent]) if parent >= 0 else []
    return ancestors


def _linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / (fan_in**0.5)
    return {
        "kernel": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound),
    }


def _dense(params, x):
    # head matmuls are tiny; keep them f32-exact on TPU (bf16 default noise
    # propagates into rotations/densities)
    return (
        jnp.matmul(x, params["kernel"], precision=jax.lax.Precision.HIGHEST)
        + params["bias"]
    )


class HumaniflowModel:
    """Functional model: static spec here, parameters in an explicit pytree.

    params layout:
      encoder:           flax ResNet variables {'params', 'batch_stats'}
      fc1 / fc_shape / fc_glob / fc_cam / fc_isgc:  dense layers
      fc_flow_context:   stacked (23, ISGC+9*MAX_A, ctx) part-batched dense
      flows:             per-part flow params stacked on a leading 23-axis
    """

    def __init__(self, cfg: ModelConfig, smpl_parents=SMPL_PARENTS):
        self.cfg = cfg
        self.parents = tuple(smpl_parents)
        self.ancestors = immediate_parent_to_all_ancestors(self.parents)
        self.num_bodyparts = len(self.ancestors)
        self.max_ancestors = max(len(a) for a in self.ancestors.values())

        # Depth levels: every part's ancestor count == its tree depth, so all
        # parts with equal ancestor count are mutually independent.
        levels: Dict[int, List[int]] = {}
        for part, anc in self.ancestors.items():
            levels.setdefault(len(anc), []).append(part)
        self.levels: List[Tuple[int, ...]] = [
            tuple(sorted(levels[d])) for d in sorted(levels)
        ]

        # Static padded ancestor index/mask tables (23, MAX_A)
        idx = np.zeros((self.num_bodyparts, self.max_ancestors), np.int32)
        mask = np.zeros((self.num_bodyparts, self.max_ancestors), np.float32)
        for part, anc in self.ancestors.items():
            idx[part, : len(anc)] = anc
            mask[part, : len(anc)] = 1.0
        self.anc_idx = jnp.asarray(idx)
        self.anc_mask = jnp.asarray(mask)
        # gather-free ancestor selection: one-hot (23, MAX_A, 23) such that
        # select[p, m, j] = mask[p, m] · [idx[p, m] == j]; contracting it with
        # the rotation buffer is an MXU matmul instead of an XLA gather
        # (TPU gathers at these shapes are ~100× slower than the matmul)
        sel = np.zeros(
            (self.num_bodyparts, self.max_ancestors, self.num_bodyparts), np.float32
        )
        for part, anc in self.ancestors.items():
            for m, a in enumerate(anc):
                sel[part, m, a] = 1.0
        self.anc_select = jnp.asarray(sel)
        # scatter-free buffer update: one-hot (23,) rows per part.  Kept as
        # numpy so per-level slices are baked in as constants at trace time.
        self.part_onehot = np.eye(self.num_bodyparts, dtype=np.float32)

        nf = cfg.NORM_FLOW
        self.flow: ConditionalFlow = create_conditional_norm_flow(
            event_dim=3,
            context_dim=nf.CONTEXT_DIM,
            num_transforms=nf.NUM_TRANSFORMS,
            transform_type=nf.TRANSFORM_TYPE,
            transform_hidden_dims=nf.TRANSFORM_NN_HIDDEN_DIMS,
            permute_type=nf.PERMUTE_TYPE,
            permute_hidden_dims=nf.PERMUTE_NN_HIDDEN_DIMS,
            batch_norm=getattr(nf, "BATCH_NORM", False),
            radial_tanh_radius=nf.COMPACT_SUPPORT_RADIUS,
            base_dist_std=nf.BASE_DIST_STD,
            count_bins=nf.NUM_SPLINE_SEGMENTS,
            bound=nf.COMPACT_SUPPORT_RADIUS,
        )
        self.so3_dist = SO3FlowDistribution(
            flow=self.flow, support_radius=nf.COMPACT_SUPPORT_RADIUS
        )

        self.encoder = resnet18() if cfg.NUM_RESNET_LAYERS == 18 else resnet50()
        self.feat_dim = RESNET_FEAT_DIMS[cfg.NUM_RESNET_LAYERS]
        self.fc1_dim = 512 if cfg.NUM_RESNET_LAYERS == 18 else 1024
        self.isgc_dim = cfg.INPUT_SHAPE_GLOB_CAM_FEATS_DIM
        self.ctx_in_dim = self.isgc_dim + 9 * self.max_ancestors

        self.init_cam = jnp.asarray(INIT_CAM, jnp.float32)
        self.init_glob = rotmat_to_rot6d(jnp.eye(3)[None])[0]

    # ------------------------------------------------------------------ init
    def init(self, key, input_shape=(1, 256, 256, 18)):
        """Initialise the parameter pytree.

        On an accelerator backend the whole init is one jitted program:
        eager init op-by-op through the tunneled TPU measured 83 s of
        dispatch round-trips (scripts/profile_cold_start.py), and running it
        on the host CPU instead stalls on per-conv-op XLA compiles — jitting
        generates the parameters ON device in one (persistently cached)
        executable.  The CPU backend keeps the eager path: tests init many
        tiny model variants and per-variant CPU compiles would dominate."""
        if jax.default_backend() == "cpu":
            return self._init_impl(key, input_shape)
        return jax.jit(self._init_impl, static_argnums=1)(key, tuple(input_shape))

    def _init_impl(self, key, input_shape):
        keys = jax.random.split(key, 8)
        encoder_vars = self.encoder.init(
            keys[0], jnp.zeros(input_shape, jnp.float32), train=False
        )
        n_betas = self.cfg.NUM_SMPL_BETAS
        part_keys = jax.random.split(keys[6], self.num_bodyparts)
        flows = jax.vmap(self.flow.init)(part_keys)

        ctx_keys = jax.random.split(keys[7], self.num_bodyparts)
        fc_flow_context = jax.vmap(
            lambda k: _linear_init(k, self.ctx_in_dim, self.cfg.NORM_FLOW.CONTEXT_DIM)
        )(ctx_keys)

        return {
            "encoder": encoder_vars,
            "fc1": _linear_init(keys[1], self.feat_dim, self.fc1_dim),
            "fc_shape": _linear_init(keys[2], self.fc1_dim, n_betas * 2),
            "fc_glob": _linear_init(keys[3], self.fc1_dim, 6),
            "fc_cam": _linear_init(keys[4], self.fc1_dim, 3),
            "fc_isgc": _linear_init(
                keys[5], self.feat_dim + n_betas + 9 + 3, self.isgc_dim
            ),
            "fc_flow_context": fc_flow_context,
            "flows": flows,
        }

    # ------------------------------------------------------------- internals
    def _isgc_feats(self, params, input_feats, shape, glob_r, cam):
        """input/shape/glob/cam intermediate features
        (reference: compute_input_shape_glob_cam_feats, humaniflow_model.py:116).
        shape may carry an extra samples axis (B, N, nb); other args (B, ...)."""
        if shape.ndim == 3:
            n = shape.shape[1]
            feats = jnp.concatenate(
                [
                    jnp.broadcast_to(input_feats[:, None], (shape.shape[0], n, self.feat_dim)),
                    shape,
                    jnp.broadcast_to(
                        glob_r.reshape(-1, 1, 9), (shape.shape[0], n, 9)
                    ),
                    jnp.broadcast_to(cam[:, None], (shape.shape[0], n, 3)),
                ],
                axis=-1,
            )
        else:
            feats = jnp.concatenate(
                [input_feats, shape, glob_r.reshape(-1, 9), cam], axis=-1
            )
        return jax.nn.elu(_dense(params["fc_isgc"], feats))

    def _part_contexts(self, params, parts, isgc, pose_so3_buffer):
        """Flow contexts for a set of parts given the rotation buffer.

        :param parts: static tuple of part indices (length P)
        :param isgc: (..., isgc_dim)
        :param pose_so3_buffer: (..., 23, 3, 3)
        :return: (..., P, ctx_dim)
        """
        parts_arr = np.asarray(parts)
        sel = self.anc_select[parts_arr]       # (P, MAX_A, 23)
        buf_flat = pose_so3_buffer.reshape(pose_so3_buffer.shape[:-3] + (self.num_bodyparts, 9))
        # masked ancestor gather as a matmul (gather-free; see anc_select)
        anc = jnp.einsum(
            "...jc,pmj->...pmc", buf_flat, sel,
            precision=jax.lax.Precision.HIGHEST,
        )  # (..., P, MAX_A, 9)
        anc_flat = anc.reshape(anc.shape[:-2] + (9 * self.max_ancestors,))
        isgc_b = jnp.broadcast_to(
            isgc[..., None, :], anc_flat.shape[:-1] + (self.isgc_dim,)
        )
        ctx_in = jnp.concatenate([isgc_b, anc_flat], axis=-1)  # (..., P, 319)
        oh = jnp.asarray(self.part_onehot[parts_arr])  # (P, 23) constant
        hi = jax.lax.Precision.HIGHEST
        w = jnp.tensordot(oh, params["fc_flow_context"]["kernel"], axes=1, precision=hi)
        b = jnp.tensordot(oh, params["fc_flow_context"]["bias"], axes=1, precision=hi)
        ctx = (
            jnp.einsum(
                "...pi,pio->...po", ctx_in, w, precision=jax.lax.Precision.HIGHEST
            )
            + b
        )
        return jax.nn.elu(ctx)

    def _part_flow_params(self, params, parts):
        # one-hot row-select instead of XLA gather (slow on TPU)
        oh = jnp.asarray(self.part_onehot[np.asarray(parts)])
        hi = jax.lax.Precision.HIGHEST
        return jax.tree_util.tree_map(
            lambda a: jnp.tensordot(oh, a, axes=1, precision=hi), params["flows"]
        )

    def _fused_level_enabled(self) -> bool:
        """Whether the AR loop routes each level's flow forward through the
        fused Pallas kernel (flows/pallas_level.py).  Default OFF — the
        kernel was built to MEASURE the r4 "fused level would win ≤2 ms"
        estimate and the measurement came back negative: one level's flow
        stack is 0.136 ms in XLA vs 0.158 ms fused, full 8-level AR
        2.94 ms XLA vs 3.13 ms fused at B·N=3232 on TPU v5e
        (scripts/profile_ar_fused.py; docs/DESIGN.md "AR dispatch bound,
        measured").  The AR loop is dominated by the sequential
        context/select/exp/blend matmuls, not flow op dispatch.  Kept as
        an opt-in (HFT_FUSED_LEVEL=1) measured prototype; off-TPU it runs
        in interpret mode (test-only, slow)."""
        mode = os.environ.get("HFT_FUSED_LEVEL", "auto")
        if mode not in ("1", "on"):
            return False
        return pallas_level.supports_flow(self.flow)

    def _autoregress(self, params, isgc, key=None, zero_sample0=False):
        """Run the depth-level AR loop.

        :param isgc: (..., isgc_dim) — batch shape (B,) for the point
            estimate or (B, N) for samples.
        :param key: PRNG key → rsample; None → flow mode (point estimate).
        :param zero_sample0: with a key and batch shape (B, N+1), use zero
            base noise for sample index 0 — its trajectory is then exactly
            the flow-mode point estimate (mode_estimate == forward(0)), so
            one fused AR pass serves both.  The noise for samples 1..N is
            drawn with the same keys/shapes as an unfused (B, N) pass, so
            the sample stream is unchanged.
        :return: (pose_so3 (..., 23, 3), pose_SO3 (..., 23, 3, 3))
        """
        batch_shape = isgc.shape[:-1]
        so3_buf = jnp.zeros(batch_shape + (self.num_bodyparts, 3), isgc.dtype)
        rot_buf = jnp.zeros(batch_shape + (self.num_bodyparts, 3, 3), isgc.dtype)
        fused = self._fused_level_enabled()
        interpret = fused and jax.default_backend() != "tpu"
        if key is not None:
            level_keys = jax.random.split(key, len(self.levels))
        for li, parts in enumerate(self.levels):
            ctx = self._part_contexts(params, parts, isgc, rot_buf)  # (...,P,C)
            flow_p = self._part_flow_params(params, parts)
            if key is None:
                z = jnp.zeros(ctx.shape[:-1] + (3,), ctx.dtype)  # flow mode
            else:
                z_shape = ctx.shape[:-1] + (3,)
                if zero_sample0:
                    noise = jax.random.normal(
                        level_keys[li],
                        (z_shape[0], z_shape[1] - 1) + z_shape[2:],
                        ctx.dtype,
                    )
                    z = jnp.concatenate(
                        [jnp.zeros_like(noise[:, :1]), noise], axis=1
                    ) * self.flow.base_dist_std
                else:
                    z = (
                        jax.random.normal(level_keys[li], z_shape, ctx.dtype)
                        * self.flow.base_dist_std
                    )
            if fused:
                packed = pallas_level.pack_level_weights(self.flow, flow_p)
                x = pallas_level.flow_forward_level(
                    self.flow, packed, z, ctx, interpret=interpret
                )
            else:
                x = self.flow.forward(flow_p, z, ctx)
            r = so3_exp(x)
            # scatter-free buffer update: one-hot blend over the part axis
            parts_arr = np.asarray(parts)
            oh = jnp.asarray(self.part_onehot[parts_arr])   # (P, 23)
            covered = jnp.asarray(self.part_onehot[parts_arr].sum(0))  # (23,)
            hi = jax.lax.Precision.HIGHEST  # one-hot blend must not quantize
            so3_buf = so3_buf * (1.0 - covered[:, None]) + jnp.einsum(
                "...pc,pj->...jc", x, oh, precision=hi
            )
            rot_buf = rot_buf * (1.0 - covered[:, None, None]) + jnp.einsum(
                "...pab,pj->...jab", r, oh, precision=hi
            )
        return so3_buf, rot_buf

    # --------------------------------------------------------------- forward
    def apply(
        self,
        params,
        proxy_input: Optional[jax.Array] = None,
        *,
        key: Optional[jax.Array] = None,
        compute_point_est: bool = True,
        num_samples: int = 0,
        use_shape_mode_for_samples: bool = False,
        compute_for_loglik: bool = False,
        shape_for_loglik: Optional[jax.Array] = None,
        pose_R_for_loglik: Optional[jax.Array] = None,
        glob_R_for_loglik: Optional[jax.Array] = None,
        input_feats: Optional[jax.Array] = None,
        grad_for_pose_point_est: bool = False,
        return_input_feats: bool = False,
        train: bool = False,
    ):
        """Forward pass (reference: humaniflow_model.py:188-340).

        :param proxy_input: (B, H, W, 18) NHWC proxy representation.
        :return: dict of predictions; when compute_for_loglik, includes
            'pose_flow_contexts_for_loglik' (B, 23, ctx) — score targets with
            `pose_log_prob`.  If train=True, also 'encoder_batch_stats'.
        """
        out = {}
        if input_feats is None:
            if train:
                input_feats, mutated = self.encoder.apply(
                    params["encoder"], proxy_input, train=True,
                    mutable=["batch_stats"],
                )
                out["encoder_batch_stats"] = mutated["batch_stats"]
            else:
                input_feats = self.encoder.apply(
                    params["encoder"], proxy_input, train=False
                )
        if return_input_feats:
            out["input_feats"] = input_feats

        x = jax.nn.elu(_dense(params["fc1"], input_feats))

        cam = _dense(params["fc_cam"], x) + self.init_cam
        glob6d = _dense(params["fc_glob"], x) + self.init_glob
        glob_r = rot6d_to_rotmat(glob6d)

        n_betas = self.cfg.NUM_SMPL_BETAS
        shape_params = _dense(params["fc_shape"], x)
        shape_mode = shape_params[:, :n_betas]
        shape_log_std = shape_params[:, n_betas:]

        out.update(
            cam_wp=cam,
            glob_rotmat=glob_r,
            shape_mode=shape_mode,
            shape_log_std=shape_log_std,
        )

        if key is not None:
            key_shape, key_pose = jax.random.split(key)

        if num_samples > 0:
            assert key is not None, "num_samples > 0 requires a PRNG key"
            if use_shape_mode_for_samples:
                shape_samples = jnp.broadcast_to(
                    shape_mode[:, None], (shape_mode.shape[0], num_samples, n_betas)
                )
            else:
                eps = jax.random.normal(
                    key_shape, (shape_mode.shape[0], num_samples, n_betas)
                )
                shape_samples = shape_mode[:, None] + eps * jnp.exp(shape_log_std)[:, None]
            out["shape_samples"] = shape_samples

        if compute_point_est and num_samples > 0:
            # Fused pass: the point estimate is the zero-noise trajectory
            # (mode_estimate == forward(0)), so prepend the shape mode as
            # sample 0 and run ONE (B, N+1) AR pass instead of two.  Cuts
            # the second 8-level dispatch chain from the inference headline
            # (scripts/profile_inference_stages.py: the B-sized point-est
            # pass cost ~as much as the B·N sample pass).
            shape_all = jnp.concatenate([shape_mode[:, None], shape_samples], axis=1)
            isgc_all = self._isgc_feats(params, input_feats, shape_all, glob_r, cam)
            so3_all, rot_all = self._autoregress(
                params, isgc_all, key=key_pose, zero_sample0=True
            )
            pose_so3_pe, pose_rot_pe = so3_all[:, 0], rot_all[:, 0]
            if not grad_for_pose_point_est:
                pose_so3_pe = jax.lax.stop_gradient(pose_so3_pe)
                pose_rot_pe = jax.lax.stop_gradient(pose_rot_pe)
            out["pose_axisangle_point_est"] = pose_so3_pe
            out["pose_rotmats_point_est"] = pose_rot_pe
            out["pose_rotmats_samples"] = rot_all[:, 1:]
        else:
            if compute_point_est:
                isgc_pe = self._isgc_feats(
                    params, input_feats, shape_mode, glob_r, cam
                )
                pose_so3_pe, pose_rot_pe = self._autoregress(params, isgc_pe, key=None)
                if not grad_for_pose_point_est:
                    pose_so3_pe = jax.lax.stop_gradient(pose_so3_pe)
                    pose_rot_pe = jax.lax.stop_gradient(pose_rot_pe)
                out["pose_axisangle_point_est"] = pose_so3_pe
                out["pose_rotmats_point_est"] = pose_rot_pe

            if num_samples > 0:
                isgc_s = self._isgc_feats(
                    params, input_feats, shape_samples, glob_r, cam
                )
                _, pose_rot_samples = self._autoregress(params, isgc_s, key=key_pose)
                out["pose_rotmats_samples"] = pose_rot_samples

        if compute_for_loglik:
            # Teacher forcing: ancestors are ground truth, so all 23 parts'
            # contexts are computed in one fused pass (no AR dependency).
            isgc_ll = self._isgc_feats(
                params, input_feats, shape_for_loglik, glob_R_for_loglik, cam
            )
            ctx = self._part_contexts(
                params, tuple(range(self.num_bodyparts)), isgc_ll, pose_R_for_loglik
            )
            out["pose_flow_contexts_for_loglik"] = ctx

        return out

    # ----------------------------------------------------------- log density
    def pose_log_prob(self, params, pose_rotmats, contexts):
        """Per-part SO(3) log-likelihoods under the ancestor-conditioned flows.

        :param pose_rotmats: (B, 23, 3, 3) target rotations
        :param contexts: (B, 23, ctx) from the loglik forward pass
        :return: (B, 23) log-probabilities
        """
        return self.so3_dist.log_prob(params["flows"], pose_rotmats, contexts)

    def so3_log_prob_per_part(self, params, part: int, rotmat, context):
        """Single-part scoring (used by the optimise pipeline)."""
        flow_p = self._part_flow_params(params, (part,))
        return self.so3_dist.log_prob(
            flow_p, rotmat[..., None, :, :], context[..., None, :]
        )[..., 0]

    def update_pose_flow_batchnorm_stats(self, params, pose_rotmats, contexts):
        """EMA-update FlowBatchNorm running statistics from a training batch
        (no-op unless MODEL.NORM_FLOW batch_norm is enabled).  Scores the
        principal so(3) log-map branch of the target rotations — the value
        the density-direction chain normalises (pyro trains its BatchNorm on
        exactly these inverse-path activations).

        :param pose_rotmats: (B, 23, 3, 3); :param contexts: (B, 23, ctx).
        :return: params with updated flow BN stats (pure; stats live in the
            params pytree).
        """
        if not self.flow.has_batch_norm:
            return params
        from ..ops.so3 import so3_log

        y = so3_log(pose_rotmats)  # (B, 23, 3) principal branch
        new_params = dict(params)
        new_params["flows"] = self.flow.update_batchnorm_stats(
            params["flows"], y, contexts
        )
        return new_params
