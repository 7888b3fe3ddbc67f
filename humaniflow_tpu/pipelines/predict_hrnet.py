"""HRNet keypoint-detection stage of the uncropped-image pipeline.

Capability parity with reference `predict/predict_hrnet.py:33-116`: person
bbox selection → aspect-matched crop to 384×288 → ImageNet normalisation →
HRNet heatmaps → argmax keypoints rescaled to input size.

TPU-first: the reference runs HRNet per image at batch size 1 inside a host
loop; here ALL images go through ONE jitted forward (`predict_hrnet_batch`)
— normalisation, the full HRNet-W48 stack and the keypoint decode are a
single compiled program at batch N (two programs when the keypoint-bbox
fallback re-crops).

Person detection: the reference uses torchvision Mask-RCNN (CUDA).  There is
no JAX equivalent; detection stays a pluggable host-side stage with three
built-in options (reference plan, SURVEY.md §7.6):

* `detect_person_bbox_torchvision` — optional torchvision-CPU adapter,
  selecting the centre-most person box exactly like the reference (:52-76);
* keypoint-derived bbox fallback — a whole-image HRNet pass finds rough
  keypoints, the confident ones determine a bbox (the joints2D branch of
  reference `utils/image_utils.py:292-301`), and a second pass runs on the
  re-crop;
* whole-image fallback when neither is available (:77-80).
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.image_ops import batch_crop_affine
from ..models.hrnet import PoseHighResolutionNet, get_kp_locations_confs_from_heatmaps

HRNET_INPUT_WH = (288, 384)   # (width, height)
HRNET_HEATMAP_WH = (72, 96)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# jitted (normalise → HRNet → keypoint decode) programs, keyed per module
# instance so repeated calls (and the fallback's second pass) reuse the
# compiled executable
_FORWARD_CACHE: Dict[int, callable] = {}


def _hrnet_forward_fn(hrnet: PoseHighResolutionNet):
    fn = _FORWARD_CACHE.get(id(hrnet))
    if fn is None:

        @jax.jit
        def fn(params, crops):
            normed = (crops - IMAGENET_MEAN) / IMAGENET_STD
            heatmaps = hrnet.apply(params, normed, train=False)  # (B, 96, 72, 17)
            joints2d, confs = get_kp_locations_confs_from_heatmaps(heatmaps)
            joints2d = joints2d * (HRNET_INPUT_WH[0] / HRNET_HEATMAP_WH[0])
            return joints2d, confs

        _FORWARD_CACHE[id(hrnet)] = fn
    return fn


def detect_person_bbox_torchvision(image_np: np.ndarray, threshold: float = 0.95):
    """Centre-most person bounding box via torchvision Mask-RCNN (CPU).

    :param image_np: (H, W, 3) RGB in [0,1].
    :return: (centre (2,) [y, x], height, width) or None if unavailable.
    """
    try:
        import torch
        from torchvision.models.detection import maskrcnn_resnet50_fpn
    except Exception:
        return None
    model = maskrcnn_resnet50_fpn(pretrained=True)
    model.eval()
    with torch.no_grad():
        pred = model([torch.from_numpy(image_np.transpose(2, 0, 1))])[0]
    person = pred["labels"] == 1
    boxes = pred["boxes"][person][pred["scores"][person] > threshold]
    if boxes.shape[0] == 0:
        return None
    boxes = boxes.numpy()  # (N, 4) x1 y1 x2 y2
    centres = np.stack(
        [(boxes[:, 1] + boxes[:, 3]) / 2, (boxes[:, 0] + boxes[:, 2]) / 2], axis=-1
    )
    h, w = image_np.shape[:2]
    dists = (centres[:, 0] - h / 2) ** 2 + (centres[:, 1] - w / 2) ** 2
    i = int(np.argmin(dists))
    return centres[i], boxes[i, 3] - boxes[i, 1], boxes[i, 2] - boxes[i, 0]


def bbox_from_keypoints(
    joints2d: np.ndarray,
    confs: np.ndarray,
    conf_threshold: float = 0.5,
    min_size: float = 64.0,
):
    """Bbox (centre [y, x], height, width) from confident 2D keypoints.

    Mirrors the joints2D branch of the reference's bbox determination
    (`utils/image_utils.py:292-301`): corners = min/max over visible joints
    with (x, y) → (y, x) coordinate swap; degenerate boxes (≤1 confident
    joint) expand to min_size.  Returns None when no joint clears the
    threshold.
    """
    vis = confs > conf_threshold
    if not vis.any():
        return None
    pts = joints2d[vis]  # (V, 2) as (x, y)
    x1, y1 = pts[:, 0].min(), pts[:, 1].min()
    x2, y2 = pts[:, 0].max(), pts[:, 1].max()
    if x2 - x1 < 1.0 and y2 - y1 < 1.0:  # single visible joint
        x2, y2 = x1 + min_size, y1 + min_size
    centre = np.array([(y1 + y2) / 2.0, (x1 + x2) / 2.0], np.float32)
    return centre, max(float(y2 - y1), min_size), max(float(x2 - x1), min_size)


def select_central_keypoint_cluster(
    joints2d: np.ndarray,
    confs: np.ndarray,
    img_h: float,
    img_w: float,
    conf_threshold: float = 0.5,
    link_factor: float = 0.3,
) -> np.ndarray:
    """Visibility mask for the dominant, most-central keypoint cluster.

    When an uncropped image contains several people, the whole-image HRNet
    pass's per-joint argmax mixes joints across persons; a bbox over ALL
    confident keypoints then spans everyone.  This mirrors the reference's
    centre-most person-box choice (`predict/predict_hrnet.py:55-76`) at the
    keypoint level: single-linkage clustering of the confident keypoints
    (link distance = link_factor · max(H, W)), keep the cluster with the
    most joints, ties broken by centroid distance to the image centre.

    :param joints2d: (17, 2) keypoints as (x, y) in source-image coords.
    :return: (17,) bool mask — confident AND in the selected cluster.
    """
    vis = confs > conf_threshold
    idx = np.where(vis)[0]
    if idx.size <= 1:
        return vis
    pts = joints2d[idx].astype(np.float64)
    thresh = link_factor * max(float(img_h), float(img_w))

    parent = np.arange(idx.size)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    for i in range(idx.size):
        for j in range(i + 1, idx.size):
            if d2[i, j] < thresh * thresh:
                parent[find(i)] = find(j)

    roots = np.array([find(i) for i in range(idx.size)])
    centre = np.array([img_w / 2.0, img_h / 2.0])
    best_root, best_key = None, None
    for r in np.unique(roots):
        members = roots == r
        centroid = pts[members].mean(0)
        key = (int(members.sum()), -float(((centroid - centre) ** 2).sum()))
        if best_key is None or key > best_key:
            best_root, best_key = r, key
    mask = np.zeros_like(vis)
    mask[idx[roots == best_root]] = True
    return mask


def _crop_to_hrnet_input(
    images: Sequence[np.ndarray],
    centres: np.ndarray,
    heights: np.ndarray,
    widths: np.ndarray,
    bbox_scale_factor: float,
) -> np.ndarray:
    """Affine-crop every image to 384×288, batching identical image shapes
    through one call each (one trace per unique source resolution).

    :return: (crops (N,384,288,3), scale (N,2), trans (N,2)) where
        dst_xy = scale·src_xy + trans is the exact crop affine.
    """
    n = len(images)
    crops = np.empty((n, HRNET_INPUT_WH[1], HRNET_INPUT_WH[0], 3), np.float32)
    scales = np.empty((n, 2), np.float32)
    transes = np.empty((n, 2), np.float32)
    groups: Dict[Tuple[int, ...], List[int]] = {}
    for i, img in enumerate(images):
        groups.setdefault(img.shape, []).append(i)
    for idxs in groups.values():
        out = batch_crop_affine(
            HRNET_INPUT_WH,
            rgb=jnp.asarray(np.stack([images[i] for i in idxs]), jnp.float32),
            bbox_centres=jnp.asarray(centres[idxs], jnp.float32),
            bbox_heights=jnp.asarray(heights[idxs], jnp.float32),
            bbox_widths=jnp.asarray(widths[idxs], jnp.float32),
            orig_scale_factor=bbox_scale_factor,
        )
        crops[idxs] = np.asarray(out["rgb"])
        scales[idxs] = np.asarray(out["crop_scale"])
        transes[idxs] = np.asarray(out["crop_trans"])
    return crops, scales, transes


def predict_hrnet_batch(
    hrnet: PoseHighResolutionNet,
    hrnet_params,
    images: Sequence[np.ndarray],
    bboxes: Optional[Sequence[Optional[Tuple]]] = None,
    object_detect_threshold: float = 0.95,
    bbox_scale_factor: float = 1.2,
    use_torchvision_detector: bool = False,
    keypoint_bbox_fallback: bool = True,
    keypoint_conf_threshold: float = 0.5,
) -> Dict:
    """N uncropped images → HRNet keypoints + crop metadata, batched.

    One jitted HRNet forward covers all N images; when the keypoint-bbox
    fallback refines whole-image boxes, a second jitted pass runs on the
    re-crops (still batched — never a per-image model call).

    :param images: sequence of (H, W, 3) RGB in [0,1] (sizes may differ).
    :param bboxes: optional per-image (centre [y,x], height, width) or None.
    :return: dict of stacked arrays — joints2D (N,17,2) in crop px,
        joints2Dconfs (N,17), cropped_images (N,384,288,3),
        bbox_centres (N,2), bbox_heights (N,), bbox_widths (N,).
    """
    n = len(images)
    centres = np.zeros((n, 2), np.float32)
    heights = np.zeros(n, np.float32)
    widths = np.zeros(n, np.float32)
    needs_fallback = []
    for i, image in enumerate(images):
        bbox = bboxes[i] if bboxes is not None else None
        if bbox is None and use_torchvision_detector:
            bbox = detect_person_bbox_torchvision(image, object_detect_threshold)
        if bbox is None:
            h, w = image.shape[:2]
            centres[i] = (h / 2.0, w / 2.0)
            heights[i], widths[i] = float(h), float(w)
            needs_fallback.append(i)
        else:
            centre, height, width = bbox
            centres[i] = np.asarray(centre, np.float32)
            heights[i], widths[i] = float(height), float(width)

    forward = _hrnet_forward_fn(hrnet)
    crops, scales, transes = _crop_to_hrnet_input(
        images, centres, heights, widths, bbox_scale_factor
    )
    joints2d, confs = forward(hrnet_params, jnp.asarray(crops))

    if keypoint_bbox_fallback and needs_fallback:
        # Map the whole-image pass's keypoints back to source coords via the
        # exact inverse crop affine and derive per-image boxes from the
        # confident ones; re-crop + re-run (both still batched over ALL
        # images — XLA reuses the compiled executable, no per-image calls).
        j2d_np = np.asarray(joints2d)
        confs_np = np.asarray(confs)
        refined = False
        for i in needs_fallback:
            src_j2d = (j2d_np[i] - transes[i]) / scales[i]
            # multi-person guard: restrict the bbox to the dominant,
            # most-central keypoint cluster (reference picks the centre-most
            # Mask-RCNN person box, predict_hrnet.py:55-76)
            h_i, w_i = images[i].shape[:2]
            keep = select_central_keypoint_cluster(
                src_j2d, confs_np[i], h_i, w_i,
                conf_threshold=keypoint_conf_threshold,
            )
            bbox = bbox_from_keypoints(
                src_j2d, np.where(keep, confs_np[i], 0.0),
                conf_threshold=keypoint_conf_threshold,
            )
            if bbox is not None:
                centres[i] = bbox[0]
                heights[i], widths[i] = bbox[1], bbox[2]
                refined = True
        if refined:
            crops, scales, transes = _crop_to_hrnet_input(
                images, centres, heights, widths, bbox_scale_factor
            )
            joints2d, confs = forward(hrnet_params, jnp.asarray(crops))

    return {
        "joints2D": np.asarray(joints2d),
        "joints2Dconfs": np.asarray(confs),
        "cropped_images": crops,
        "bbox_centres": centres,
        "bbox_heights": heights,
        "bbox_widths": widths,
    }


def predict_hrnet(
    hrnet: PoseHighResolutionNet,
    hrnet_params,
    image: np.ndarray,
    bbox: Optional[Tuple] = None,
    object_detect_threshold: float = 0.95,
    bbox_scale_factor: float = 1.2,
    use_torchvision_detector: bool = False,
    keypoint_bbox_fallback: bool = True,
) -> Dict:
    """Single uncropped image → HRNet keypoints + crop metadata (batched
    path at N=1; reference predict/predict_hrnet.py:33-116)."""
    out = predict_hrnet_batch(
        hrnet, hrnet_params, [image], bboxes=[bbox],
        object_detect_threshold=object_detect_threshold,
        bbox_scale_factor=bbox_scale_factor,
        use_torchvision_detector=use_torchvision_detector,
        keypoint_bbox_fallback=keypoint_bbox_fallback,
    )
    return {
        "joints2D": out["joints2D"][0],
        "joints2Dconfs": out["joints2Dconfs"][0],
        "cropped_image": out["cropped_images"][0],
        "bbox_centre": out["bbox_centres"][0],
        "bbox_height": float(out["bbox_heights"][0]),
        "bbox_width": float(out["bbox_widths"][0]),
    }
