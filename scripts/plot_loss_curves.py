"""Plot training loss/metric curves from a pickled log.pkl history
(reference: utils/plot_loss_curves.py:9-44)."""

import argparse
import pickle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log_path", "-L", type=str, required=True)
    parser.add_argument("--metrics", "-M", nargs="*",
                        default=["losses", "PVE-SC", "joints2D-L2E"])
    parser.add_argument("--save_path", "-S", type=str, default=None)
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg" if args.save_path else matplotlib.get_backend())
    import matplotlib.pyplot as plt

    with open(args.log_path, "rb") as f:
        history = pickle.load(f)

    fig, axes = plt.subplots(1, len(args.metrics), figsize=(5 * len(args.metrics), 4))
    if len(args.metrics) == 1:
        axes = [axes]
    for ax, metric in zip(axes, args.metrics):
        ax.plot(history[f"train_{metric}"], label="train")
        ax.plot(history[f"val_{metric}"], label="val")
        ax.set_title(metric)
        ax.set_xlabel("epoch")
        ax.legend()
    if args.save_path:
        fig.savefig(args.save_path, dpi=100, bbox_inches="tight")
        print("saved", args.save_path)
    else:
        plt.show()


if __name__ == "__main__":
    main()
