from .canny import CannyEdgeDetector
from .hrnet import PoseHighResolutionNet, get_kp_locations_confs_from_heatmaps
from .humaniflow import HumaniflowModel, immediate_parent_to_all_ancestors
from .resnet import RESNET_FEAT_DIMS, ResNet, resnet18, resnet50
from .smpl import (
    NUM_BODYPARTS,
    NUM_SMPL_JOINTS,
    SMPL_PARENTS,
    SMPLModel,
    convert_smpl_pkl,
    load_smpl_npz,
    smpl_forward,
    synthetic_smpl,
)

__all__ = [
    "CannyEdgeDetector",
    "PoseHighResolutionNet",
    "get_kp_locations_confs_from_heatmaps",
    "HumaniflowModel",
    "immediate_parent_to_all_ancestors",
    "RESNET_FEAT_DIMS",
    "ResNet",
    "resnet18",
    "resnet50",
    "NUM_BODYPARTS",
    "NUM_SMPL_JOINTS",
    "SMPL_PARENTS",
    "SMPLModel",
    "convert_smpl_pkl",
    "load_smpl_npz",
    "smpl_forward",
    "synthetic_smpl",
]
