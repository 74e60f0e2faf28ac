"""CelebA-HQ / FFHQ 256 NCSN++ config (BASELINE.json configs[4]).

The full-size Song-et-al NCSN++ (ch_mult (1,1,2,2,2,2,2), biggan blocks,
FIR, progressive output_skip/input_skip) with the ID-estimation settings:
sharded score collection over the mesh, dim_estimation.batch_size tuned for
d = 256·256·3.  Expects a folder of images under data.base_dir/data.dataset.
"""
import ml_collections

from iddiff.configs.default import get_default_configs


def get_config():
    config = get_default_configs()

    config.logging.log_path = "logs/ffhq256/"
    config.logging.log_name = "ffhq256"
    config.logging.svd_frequency = 0  # offline ID only at this scale
    config.logging.svd_points = 16
    config.logging.eval_freq_epochs = 1

    config.training.batch_size = 32
    config.training.sde = "vesde"
    config.training.visualization_callback = ["base"]

    config.data = data = ml_collections.ConfigDict()
    data.datamodule = "image"
    data.dataset = "ffhq256"
    data.base_dir = "datasets/"
    data.crop = False
    data.split = [0.95, 0.025, 0.025]
    data.image_size = 256
    data.effective_image_size = 256
    data.num_channels = 3
    data.centered = True
    data.use_data_mean = False
    data.return_labels = False
    data.shape = [256, 256, 3]

    config.model = model = ml_collections.ConfigDict()
    model.checkpoint_path = None
    model.sigma_max = 348.0
    model.sigma_min = 1e-2
    model.name = "ncsnpp"
    model.nf = 128
    model.ch_mult = [1, 1, 2, 2, 2, 2, 2]
    model.num_res_blocks = 2
    model.attn_resolutions = [16]
    model.dropout = 0.0
    model.resamp_with_conv = True
    model.conditional = True
    model.fir = True
    model.fir_kernel = [1, 3, 3, 1]
    model.skip_rescale = True
    model.resblock_type = "biggan"
    model.progressive = "output_skip"
    model.progressive_input = "input_skip"
    model.progressive_combine = "sum"
    model.embedding_type = "fourier"
    model.fourier_scale = 16.0
    model.init_scale = 0.0
    model.nonlinearity = "swish"
    model.output_channels = 3
    model.num_scales = 2000
    model.ema_rate = 0.9999
    model.compute_dtype = "bfloat16"
    model.remat = False  # ncsnpp remat hook not wired; use small batches

    config.optim.lr = 2e-4
    config.optim.warmup = 5000
    config.optim.grad_clip = 1.0

    config.dim_estimation = ml_collections.ConfigDict()
    config.dim_estimation.num_datapoints = 16
    config.dim_estimation.batch_size = 16  # K ≈ 4·196608 evals per point
    return config
