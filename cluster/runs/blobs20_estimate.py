"""50-point fp32 estimation config for the blobs-20 paper run.

  python main.py --config cluster/runs/blobs20_estimate.py \
      --mode manifold_dimension --workdir logs/blobs_paper/20
"""
import pickle


def get_config():
    with open("/root/repo/logs/blobs_paper/20/config.pkl", "rb") as f:
        c = pickle.load(f)
    if "compute_dtype" in c.model:
        del c.model.compute_dtype  # estimate in fp32
    c.model.checkpoint_path = "/root/repo/logs/blobs_paper/20"
    c.model.restore_which = "last"  # newest step, not best-eval_loss
    import ml_collections

    if "dim_estimation" not in c:
        c.dim_estimation = ml_collections.ConfigDict()
    c.dim_estimation.num_datapoints = 50
    c.dim_estimation.compute_batch_size = 256
    c.dim_estimation.points_per_chunk = 4
    return c
