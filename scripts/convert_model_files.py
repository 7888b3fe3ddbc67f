"""Convert external model files into framework formats:

* SMPL .pkl (neutral/male/female) → .npz (models/smpl.convert_smpl_pkl)
* reference humaniflow_weights.tar → orbax params checkpoint
* reference pose_hrnet_w48_384x288.pth → orbax params checkpoint
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smpl_pkl", type=str, default=None)
    parser.add_argument("--smpl_out", type=str, default=None)
    parser.add_argument("--humaniflow_tar", type=str, default=None)
    parser.add_argument("--hrnet_pth", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default="model_files/converted")
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)

    if args.smpl_pkl:
        from humaniflow_tpu.models.smpl import convert_smpl_pkl

        out = args.smpl_out or os.path.join(
            args.out_dir,
            os.path.splitext(os.path.basename(args.smpl_pkl))[0] + ".npz",
        )
        convert_smpl_pkl(args.smpl_pkl, out)
        print("SMPL →", out)

    if args.humaniflow_tar:
        from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
        from humaniflow_tpu.models import HumaniflowModel
        from humaniflow_tpu.utils.checkpoints import save_checkpoint
        from humaniflow_tpu.utils.convert_torch import convert_humaniflow_file

        model = HumaniflowModel(get_humaniflow_cfg_defaults().MODEL)
        params = convert_humaniflow_file(args.humaniflow_tar, model)
        path = save_checkpoint(args.out_dir, "humaniflow_params", {"params": params})
        print("HuManiFlow weights →", path)

    if args.hrnet_pth:
        from humaniflow_tpu.utils.checkpoints import save_checkpoint
        from humaniflow_tpu.utils.convert_torch import convert_hrnet_file

        variables = convert_hrnet_file(args.hrnet_pth)
        path = save_checkpoint(args.out_dir, "hrnet_params", {"params": variables})
        print("HRNet weights →", path)


if __name__ == "__main__":
    main()
