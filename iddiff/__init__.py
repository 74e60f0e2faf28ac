"""iddiff — TPU-native score-based diffusion & intrinsic-dimension estimation.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of GBATZOLIS/ID-diff
(the official implementation of "Diffusion Models Encode the Intrinsic
Dimension of Data Manifolds", ICML 2024).  The compute path is pure
functional JAX (jit/scan/pjit over a device mesh); nothing here is a port of
the reference's PyTorch-Lightning object graph.

Layer map (mirrors SURVEY.md §1):
  kernels/   Pallas TPU kernels (upfirdn2d, fused_bias_act) + lax references
  nn/        Flax layer library (time embeddings, resblocks, attention, FIR)
  models/    score-network registry (mlp/fcn, ddpm unet, ncsnpp, ...)
  sde/       VE/VP/subVP/SNR SDEs, reverse SDE, perturbation kernels
  losses/    denoising-score-matching losses (+conditional variants)
  sampling/  predictor/corrector registries, scanned PC driver, ODE sampler
  likelihood/ probability-flow-ODE log-likelihood
  training/  functional train state, jitted train step, EMA, orbax ckpts
  parallel/  mesh construction, sharding rules, per-host data sharding
  data/      dataset generators (ksphere, line, mammoth, synthetic images, ...)
  id/        intrinsic-dimension estimator (sharded score collection + SVD)
  analysis/  spectrum plots, dim read-out, classical baselines (MLE, ...)
  configs/   ml_collections experiment configs
"""

__version__ = "0.1.0"
