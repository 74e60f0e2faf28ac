"""Bicubic-2x SR3 paired run on a synthetic image manifold (VERDICT r2
item 5: a real conditional/SR result on hardware).

Task: super-resolve 16->32 (bicubic-downsampled LR, upsampled back to HR
as the SR3 condition, reference ddpm_paired_SR3 + PairedDataset) on the
FixedSquares 32x32 manifold.  Train on the chip, then
`--mode test` reports test_loss + PSNR/SSIM/MS-SSIM of conditional PC
samples vs ground truth (reference: run_lib.py:73-100,
PairedCallback.py:88-232).

  python main.py --config cluster/runs/sr2x_run.py --mode train \
      --workdir logs/sr2x
  python main.py --config cluster/runs/sr2x_run.py --mode test \
      --workdir logs/sr2x
"""
import ml_collections


def get_config():
    c = ml_collections.ConfigDict()
    c.seed = 0
    c.logging = ml_collections.ConfigDict(dict(
        log_path="logs/sr2x", log_name="sr2x", top_k=2, every_n_epochs=4,
        envery_timedelta=None, svd_frequency=10_000, svd_points=2,
        viz_frequency=1000,
    ))
    c.training = ml_collections.ConfigDict(dict(
        lightning_module="conditional", conditioning_approach="sr3",
        batch_size=128, num_epochs=10_000, n_iters=20_000, log_freq=50,
        eval_freq=2500, likelihood_weighting=True, continuous=True,
        reduce_mean=False, sde="vesde", visualization_callback=None,
        workers=0, accumulate_grad_batches=1, show_evolution=False,
    ))
    c.validation = ml_collections.ConfigDict({"batch_size": 128, "workers": 0})
    c.eval = ml_collections.ConfigDict(
        {"batch_size": 128, "workers": 0, "max_batches": 4})
    c.sampling = ml_collections.ConfigDict(dict(
        method="pc", predictor="conditional_reverse_diffusion",
        corrector="conditional_none", n_steps_each=1, noise_removal=True,
        probability_flow=False, snr=0.15,
    ))
    c.data = ml_collections.ConfigDict(dict(
        datamodule="paired", base_datamodule="Synthetic",
        dataset_type="FixedSquaresManifold", data_samples=20_000,
        num_squares=10, square_range=[3, 5], image_size=32,
        split=[0.8, 0.1, 0.1], scale=2,
        upsample_lr=True,  # SR3 contract: condition at HR resolution
        return_labels=False, use_data_mean=False, centered=False,
        num_channels=1, effective_image_size=32, cache_generated=True,
    ))
    c.model = ml_collections.ConfigDict(dict(
        name="ddpm_paired_SR3", checkpoint_path=None,
        sigma_min_x=1e-2, sigma_max_x=10.0, num_scales=1000, ema_rate=0.999,
        nf=64, ch_mult=[1, 2, 2], num_res_blocks=2, attn_resolutions=[16],
        dropout=0.0, resamp_with_conv=True, conditional=True,
        nonlinearity="swish", input_channels=2, output_channels=1,
    ))
    c.optim = ml_collections.ConfigDict(dict(
        weight_decay=0.0, optimizer="Adam", lr=2e-4, beta1=0.9, eps=1e-8,
        warmup=1000, grad_clip=1.0,
    ))
    return c
