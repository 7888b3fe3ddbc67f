"""Shipped evaluation protocols: the per-dataset metric lists.

These are the exact metric sets the reference evaluates with
(`/root/reference/scripts/run_evaluate.py:70-94`): 3DPW adds the
min-over-samples distribution-accuracy variants of every point-estimate
metric; SSP-3D adds the silhouette consistency metrics (point-estimate and
per-sample IOU).  `scripts/run_evaluate.py` and the test suite share these
lists so the shipped protocols are what CI runs.
"""

_PW3D_POINT_METRICS = [
    "PVE", "PVE-SC", "PVE-PA", "PVE-T-SC", "MPJPE", "MPJPE-SC", "MPJPE-PA",
]

EVAL_METRICS_3DPW = (
    _PW3D_POINT_METRICS
    + [m + "_samples_min" for m in _PW3D_POINT_METRICS]
    + [
        "joints2D-L2E",
        "joints2Dsamples-L2E",
        "verts3D_sample_diversity",
        "joints3D_sample_diversity",
        "joints3D_invis_sample_diversity",
        "joints3D_vis_sample_diversity",
    ]
)

EVAL_METRICS_SSP3D = [
    "PVE-SC",
    "PVE-PA",
    "PVE-T-SC",
    "joints2D-L2E",
    "silhouette-IOU",
    "joints2Dsamples-L2E",
    "silhouettesamples-IOU",
    "verts3D_sample_diversity",
    "joints3D_sample_diversity",
    "joints3D_invis_sample_diversity",
    "joints3D_vis_sample_diversity",
]
