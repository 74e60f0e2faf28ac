"""gaussian-blobs-20 paper run (VERDICT r4 item 2: a SECOND image ID value).

Same recipe as the completed blobs-10 120k run (cluster/runs/blobs10_run.py),
with num_gaussians=20 (reference: configs/dimension_estimation/paper/
image_data/gaussian_blobs/20.py — ID = num_gaussians per
SyntheticDataset.py:170-183).  120k-step budget matched to blobs-10's
completed run; 15-min wall-clock 'last' cadence bounds rebuild loss.
"""
import datetime
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "gb20",
    "/root/repo/iddiff/configs/dimension_estimation/paper/image_data/gaussian_blobs/20.py",
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def get_config():
    c = _mod.get_config()
    c.training.n_iters = 120_000
    c.logging.log_path = "/root/repo/logs/blobs_paper"
    c.logging.log_name = "20"
    c.logging.svd_frequency = 4   # in-training 5-point spectrum probes
    c.logging.svd_points = 5
    c.logging.save_svd = True
    c.logging.every_n_epochs = 8
    c.logging.top_k = 3
    c.data.cache_generated = True
    c.data.on_device_generation = True
    c.logging.eval_freq_epochs = 4
    c.logging.envery_timedelta = datetime.timedelta(minutes=15)
    return c
