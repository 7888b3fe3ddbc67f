"""Arrange exported LSUN background images into the train_files layout
(reference: data/copy_lsun_images_to_train_files_dir.py:7-36)."""

import argparse
import os
import shutil


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--lsun_dir", type=str, required=True,
                        help="directory of exported LSUN .jpg/.webp images")
    parser.add_argument("--out_train_dir", type=str, required=True)
    parser.add_argument("--out_val_dir", type=str, required=True)
    parser.add_argument("--num_val", type=int, default=3000)
    args = parser.parse_args()

    os.makedirs(args.out_train_dir, exist_ok=True)
    os.makedirs(args.out_val_dir, exist_ok=True)
    fnames = sorted(
        f for f in os.listdir(args.lsun_dir) if f.endswith((".jpg", ".jpeg", ".webp"))
    )
    val, train = fnames[: args.num_val], fnames[args.num_val :]
    for group, out_dir in ((train, args.out_train_dir), (val, args.out_val_dir)):
        for i, f in enumerate(group):
            dst = os.path.join(out_dir, f"{os.path.splitext(f)[0]}.jpg")
            shutil.copyfile(os.path.join(args.lsun_dir, f), dst)
            if i % 10000 == 0:
                print(out_dir, i, "/", len(group))
    print(f"train: {len(train)}  val: {len(val)}")


if __name__ == "__main__":
    main()
