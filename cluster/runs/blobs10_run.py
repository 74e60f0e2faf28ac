"""gaussian-blobs-10 paper-budget run config (VERDICT r1 item 10)."""
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "gb10",
    "/root/repo/iddiff/configs/dimension_estimation/paper/image_data/gaussian_blobs/10.py",
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def get_config():
    c = _mod.get_config()
    c.training.n_iters = 120_000
    c.logging.log_path = "/root/repo/logs/blobs_paper"
    c.logging.log_name = "10"
    c.logging.svd_frequency = 4
    c.logging.svd_points = 5
    c.logging.save_svd = True
    c.logging.every_n_epochs = 8
    c.logging.top_k = 3
    c.data.cache_generated = True
    # TPU-native hot loop: synthesize batches on device from index-keyed
    # PRNG and fuse log_freq steps per dispatch (no per-step host traffic;
    # also skips the ~6-min 2GB npz load at startup)
    c.data.on_device_generation = True
    c.logging.eval_freq_epochs = 4
    return c
