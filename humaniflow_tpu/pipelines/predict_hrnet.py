"""HRNet keypoint-detection stage of the uncropped-image pipeline.

Capability parity with reference `predict/predict_hrnet.py:33-116`: person
bbox selection → aspect-matched crop to 384×288 → ImageNet normalisation →
HRNet heatmaps → argmax keypoints rescaled to input size.

Person detection: the reference uses torchvision Mask-RCNN (CUDA).  There is
no JAX equivalent; detection stays a pluggable host-side stage with two
built-in options (reference plan, SURVEY.md §7.6):

* `detect_person_bbox_torchvision` — optional torchvision-CPU adapter,
  selecting the centre-most person box exactly like the reference (:52-76);
* whole-image fallback when no detector / no person found (:77-80).
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.image_ops import batch_crop_affine
from ..models.hrnet import PoseHighResolutionNet, get_kp_locations_confs_from_heatmaps

HRNET_INPUT_WH = (288, 384)   # (width, height)
HRNET_HEATMAP_WH = (72, 96)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


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


def predict_hrnet(
    hrnet: PoseHighResolutionNet,
    hrnet_params,
    image: np.ndarray,
    bbox: Optional[Tuple] = None,
    object_detect_threshold: float = 0.95,
    bbox_scale_factor: float = 1.2,
    use_torchvision_detector: bool = False,
) -> Dict:
    """Single uncropped image → HRNet keypoints + crop metadata.

    :param image: (H, W, 3) RGB in [0,1].
    :param bbox: optional (centre [y,x], height, width) from any detector.
    """
    h, w = image.shape[:2]
    if bbox is None and use_torchvision_detector:
        bbox = detect_person_bbox_torchvision(image, object_detect_threshold)
    if bbox is None:
        centre = np.array([h / 2.0, w / 2.0], np.float32)
        height, width = float(h), float(w)
    else:
        centre, height, width = bbox
        centre = np.asarray(centre, np.float32)
        height, width = float(height), float(width)

    crop = batch_crop_affine(
        HRNET_INPUT_WH,
        rgb=jnp.asarray(image, jnp.float32)[None],
        bbox_centres=jnp.asarray(centre, jnp.float32)[None],
        bbox_heights=jnp.asarray([height], jnp.float32),
        bbox_widths=jnp.asarray([width], jnp.float32),
        orig_scale_factor=bbox_scale_factor,
    )
    cropped = crop["rgb"]  # (1, 384, 288, 3)

    normed = (cropped - IMAGENET_MEAN) / IMAGENET_STD
    heatmaps = hrnet.apply(hrnet_params, normed, train=False)  # (1, 96, 72, 17)
    joints2d, confs = get_kp_locations_confs_from_heatmaps(heatmaps)
    joints2d = joints2d * (HRNET_INPUT_WH[0] / HRNET_HEATMAP_WH[0])

    return {
        "joints2D": joints2d[0],
        "joints2Dconfs": confs[0],
        "cropped_image": cropped[0],
        "bbox_centre": centre,
        "bbox_height": height,
        "bbox_width": width,
    }
