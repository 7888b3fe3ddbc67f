"""3DPW test-set preprocessor (reference: data/pw3d_preprocess.py:106-248).

Reads 3DPW sequence pickles, poses gendered SMPL models, transforms global
pose by the camera extrinsics (reference :211), projects vertices to find
person bounding boxes, writes square cropped frames + `3dpw_test.npz`
(imgname / pose / shape / gender / joints2D_coco).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pw3d_dir", type=str, required=True,
                        help="3DPW root with sequenceFiles/ and imageFiles/")
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--crop_wh", type=int, default=512)
    parser.add_argument("--bbox_scale_factor", type=float, default=1.2)
    args = parser.parse_args()

    import cv2
    import jax.numpy as jnp

    from humaniflow_tpu.configs import paths
    from humaniflow_tpu.models import load_smpl_npz, smpl_forward
    from humaniflow_tpu.ops.so3 import so3_exp, so3_log

    seq_dir = os.path.join(args.pw3d_dir, "sequenceFiles", "test")
    img_root = os.path.join(args.pw3d_dir, "imageFiles")
    frames_out = os.path.join(args.out_dir, "cropped_frames")
    os.makedirs(frames_out, exist_ok=True)

    smpl = {
        "m": load_smpl_npz(paths.SMPL_MALE),
        "f": load_smpl_npz(paths.SMPL_FEMALE),
    }

    imgnames, poses, shapes, genders, joints2d_coco = [], [], [], [], []
    for seq_file in sorted(os.listdir(seq_dir)):
        with open(os.path.join(seq_dir, seq_file), "rb") as f:
            seq = pickle.load(f, encoding="latin1")
        seq_name = str(seq["sequence"])
        num_people = len(seq["poses"])
        cam_ext = np.asarray(seq["cam_poses"])  # (F, 4, 4)
        for p in range(num_people):
            valid = np.asarray(seq["campose_valid"][p]).astype(bool)
            pose_seq = np.asarray(seq["poses"][p])       # (F, 72)
            shape_p = np.asarray(seq["betas"][p][:10])
            gender = str(seq["genders"][p])
            j2d_seq = np.asarray(seq["poses2d"][p])      # (F, 3, 18) COCO18
            for fi in np.nonzero(valid)[0]:
                img_path = os.path.join(img_root, seq_name, f"image_{fi:05d}.jpg")
                if not os.path.exists(img_path):
                    continue
                pose = pose_seq[fi].copy()
                # apply camera extrinsic rotation to global orient (:211)
                R_cam = cam_ext[fi, :3, :3]
                R_glob = np.asarray(so3_exp(jnp.asarray(pose[None, :3], jnp.float32)))[0]
                pose[:3] = np.asarray(
                    so3_log(jnp.asarray((R_cam @ R_glob)[None], jnp.float32))
                )[0]

                out = smpl_forward(
                    smpl[gender[0]],
                    jnp.asarray(shape_p, jnp.float32)[None],
                    jnp.asarray(pose[3:], jnp.float32)[None].reshape(1, 69),
                    jnp.asarray(pose[:3], jnp.float32)[None],
                    pose2rot=True,
                )
                verts = np.asarray(out["vertices"][0]) + np.asarray(
                    seq["trans"][p][fi]
                )
                # project with sequence intrinsics for the person bbox
                K = np.asarray(seq["cam_intrinsics"])
                v_cam = verts @ cam_ext[fi, :3, :3].T + cam_ext[fi, :3, 3]
                proj = (v_cam / v_cam[:, 2:]) @ K.T
                x1, y1 = proj[:, 0].min(), proj[:, 1].min()
                x2, y2 = proj[:, 0].max(), proj[:, 1].max()
                cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
                half = max(x2 - x1, y2 - y1) * args.bbox_scale_factor / 2

                image = cv2.imread(img_path)
                h, w = image.shape[:2]
                xa, xb = int(round(cx - half)), int(round(cx + half))
                ya, yb = int(round(cy - half)), int(round(cy + half))
                crop = np.zeros((yb - ya, xb - xa, 3), image.dtype)
                sy, sx = max(0, -ya), max(0, -xa)
                crop[
                    sy : sy + min(h, yb) - max(0, ya),
                    sx : sx + min(w, xb) - max(0, xa),
                ] = image[max(0, ya) : min(h, yb), max(0, xa) : min(w, xb)]
                crop = cv2.resize(crop, (args.crop_wh, args.crop_wh))

                fname = f"{seq_name}_p{p}_frame{fi:05d}.png"
                cv2.imwrite(os.path.join(frames_out, fname), crop)

                # GT 2D joints (OpenPose-18 → COCO-17 map) in crop coords
                from humaniflow_tpu.data.label_conversions import (
                    PW3D_JOINTS2D_TO_COCO_MAP,
                )

                j2d = j2d_seq[fi].T  # (18, 3)
                j2d_coco = j2d[PW3D_JOINTS2D_TO_COCO_MAP]
                scale = args.crop_wh / (2 * half)
                j2d_coco[:, 0] = (j2d_coco[:, 0] - xa) * scale
                j2d_coco[:, 1] = (j2d_coco[:, 1] - ya) * scale

                imgnames.append(fname)
                poses.append(pose)
                shapes.append(shape_p)
                genders.append(gender)
                joints2d_coco.append(j2d_coco)

    np.savez(
        os.path.join(args.out_dir, "3dpw_test.npz"),
        imgname=np.array(imgnames),
        pose=np.stack(poses),
        shape=np.stack(shapes),
        gender=np.array(genders),
        joints2D_coco=np.stack(joints2d_coco),
    )
    print(f"Wrote {len(imgnames)} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
