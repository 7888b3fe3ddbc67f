from .evaluate import evaluate_humaniflow, make_eval_step
from .optimise import make_optimise_fn, optimise_batch_with_humaniflow_prior
from .predict_hrnet import (
    bbox_from_keypoints,
    detect_person_bbox_torchvision,
    predict_hrnet,
    predict_hrnet_batch,
)
from .train import make_synth_data_fn, train_humaniflow
from .predict import (
    build_proxy_representation,
    make_predict_fn,
    predict_humaniflow,
    save_pred_output,
)
from .train_step import make_train_step, predict_joints2d

__all__ = [
    "evaluate_humaniflow",
    "make_eval_step",
    "bbox_from_keypoints",
    "detect_person_bbox_torchvision",
    "predict_hrnet",
    "predict_hrnet_batch",
    "make_synth_data_fn",
    "train_humaniflow",
    "make_optimise_fn",
    "optimise_batch_with_humaniflow_prior",
    "build_proxy_representation",
    "make_predict_fn",
    "predict_humaniflow",
    "save_pred_output",
    "make_train_step",
    "predict_joints2d",
]
