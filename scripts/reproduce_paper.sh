#!/usr/bin/env bash
# Reproduce the paper's ID-estimation experiments end-to-end on one TPU chip
# (reference: README.md:28-37 — train, then --mode manifold_dimension).
#
# Euclidean experiments (minutes each; RESULTS.md has archived outcomes):
#   10-sphere in R^100 (truth 10), 50-sphere (truth 50), mammoth (2), line (1)
#
# Image experiments (hours; paper configs at full budget):
#   squares-10 / blobs-10 (truth = #components), 32x32, DDPM U-Net nf=128
#
# Usage: bash scripts/reproduce_paper.sh [experiment]
set -euo pipefail
cd "$(dirname "$0")/.."

EXP="${1:-ksphere10}"

case "$EXP" in
  ksphere10)
    python main.py --config iddiff/configs/dimension_estimation/ksphere.py \
        --config_variant 10 --mode train --workdir logs/ksphere/10
    python main.py --config iddiff/configs/dimension_estimation/ksphere.py \
        --config_variant 10 --mode manifold_dimension \
        --checkpoint_path logs/ksphere/10 --workdir logs/ksphere/10
    ;;
  ksphere50)
    python main.py --config iddiff/configs/dimension_estimation/ksphere.py \
        --config_variant 50 --mode train --workdir logs/ksphere/50
    python main.py --config iddiff/configs/dimension_estimation/ksphere.py \
        --config_variant 50 --mode manifold_dimension \
        --checkpoint_path logs/ksphere/50 --workdir logs/ksphere/50
    ;;
  mammoth)
    python main.py --config iddiff/configs/dimension_estimation/mammoth.py \
        --mode train --workdir logs/mammoth
    python main.py --config iddiff/configs/dimension_estimation/mammoth.py \
        --mode manifold_dimension --checkpoint_path logs/mammoth \
        --workdir logs/mammoth
    ;;
  squares10)
    # full paper budget (nf=128, ch_mult 1222, dropout 0.1, sigma_max 50)
    python main.py \
        --config iddiff/configs/dimension_estimation/paper/image_data/squares/10.py \
        --mode train --workdir logs/squares_paper/10
    python main.py \
        --config iddiff/configs/dimension_estimation/paper/image_data/squares/10.py \
        --mode manifold_dimension --checkpoint_path logs/squares_paper/10 \
        --workdir logs/squares_paper/10
    ;;
  blobs10)
    python main.py \
        --config iddiff/configs/dimension_estimation/paper/image_data/gaussian_blobs/10.py \
        --mode train --workdir logs/blobs_paper/10
    python main.py \
        --config iddiff/configs/dimension_estimation/paper/image_data/gaussian_blobs/10.py \
        --mode manifold_dimension --checkpoint_path logs/blobs_paper/10 \
        --workdir logs/blobs_paper/10
    ;;
  oracle)
    # zero-training sanity: the analytic k-sphere oracle reads exact k
    python - <<'PY'
import jax, jax.numpy as jnp, numpy as np, ml_collections
from iddiff.models import create_model, get_score_fn
from iddiff.sde import VESDE
from iddiff.id import collect_spectra, dims_from_spectra
from iddiff.data.ksphere import generate_ksphere
k, d = 10, 100
c = ml_collections.ConfigDict()
c.model = ml_collections.ConfigDict({"name": "ksphere_gt_exact"})
c.data = ml_collections.ConfigDict({"manifold_dim": k, "ambient_dim": d,
                                    "embedding_type": "random_isometry"})
model = create_model(c)
sde = VESDE(sigma_min=1e-2, sigma_max=4.0, N=1000)
params = model.init(jax.random.PRNGKey(0), jnp.ones((2, d)), jnp.ones((2,)))["params"]
data = generate_ksphere(n_samples=8, n_spheres=1, ambient_dim=d,
                        manifold_dim=k, noise_std=0.0,
                        embedding_type="random_isometry", seed=3)
spectra, _ = collect_spectra(jax.random.PRNGKey(1), sde,
                             get_score_fn(sde, model, params),
                             jnp.asarray(data), batch_size=500, t=1e-5)
print("dims:", dims_from_spectra(np.asarray(spectra)), "(truth", k, ")")
PY
    ;;
  *)
    echo "unknown experiment '$EXP' (ksphere10|ksphere50|mammoth|squares10|blobs10|oracle)"
    exit 1
    ;;
esac
