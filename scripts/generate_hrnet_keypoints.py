"""Generate HRNet keypoint detections for a directory of (square) cropped
frames — produces the `hrnet_results_centred.npy` consumed by
PW3DEvalDataset (reference ships this file precomputed; this script lets
users regenerate it for new data or extreme-crop variants)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames_dir", type=str, required=True)
    parser.add_argument("--out_path", type=str, required=True)
    parser.add_argument("--hrnet_checkpoint", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from humaniflow_tpu.models.hrnet import (
        PoseHighResolutionNet,
        get_kp_locations_confs_from_heatmaps,
    )
    from humaniflow_tpu.pipelines.predict_hrnet import (
        HRNET_HEATMAP_WH,
        HRNET_INPUT_WH,
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    hrnet = PoseHighResolutionNet()
    if args.hrnet_checkpoint:
        from humaniflow_tpu.utils.convert_torch import convert_hrnet_file

        params = convert_hrnet_file(args.hrnet_checkpoint)
    else:
        print("WARNING: no HRNet checkpoint — random init")
        params = hrnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 384, 288, 3)))

    @jax.jit
    def detect(batch):
        normed = (batch - IMAGENET_MEAN) / IMAGENET_STD
        heatmaps = hrnet.apply(params, normed, train=False)
        kps, confs = get_kp_locations_confs_from_heatmaps(heatmaps)
        return kps * (HRNET_INPUT_WH[0] / HRNET_HEATMAP_WH[0]), confs

    fnames = sorted(
        f for f in os.listdir(args.frames_dir) if f.endswith((".png", ".jpg"))
    )
    results = np.zeros((len(fnames), 17, 3), np.float32)
    w_in, h_in = HRNET_INPUT_WH
    for start in range(0, len(fnames), args.batch_size):
        chunk = fnames[start : start + args.batch_size]
        imgs = np.zeros((len(chunk), h_in, w_in, 3), np.float32)
        scales = np.zeros((len(chunk), 2), np.float32)
        for i, f in enumerate(chunk):
            img = cv2.cvtColor(
                cv2.imread(os.path.join(args.frames_dir, f)), cv2.COLOR_BGR2RGB
            )
            oh, ow = img.shape[:2]
            imgs[i] = cv2.resize(img, (w_in, h_in)) / 255.0
            # keypoints come out in HRNet-input pixels; map to frame pixels
            scales[i] = [ow / w_in, oh / h_in]
        kps, confs = detect(jnp.asarray(imgs))
        kps = np.asarray(kps) * scales[:, None, :]
        results[start : start + len(chunk), :, :2] = kps
        results[start : start + len(chunk), :, 2] = np.asarray(confs)
        if start % (args.batch_size * 10) == 0:
            print(f"{start}/{len(fnames)}")

    np.save(args.out_path, results)
    print(f"Wrote {results.shape} → {args.out_path}")


if __name__ == "__main__":
    main()
