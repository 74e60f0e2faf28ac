"""Run orchestration: train / manifold_dimension / test / statistics modes.

Rebuild of /root/reference/run_lib.py:37-325 + dim_reduction.py:12-215 on the
functional trainer.  The workdir replaces the Lightning log dir; checkpoints
live under <workdir>/{best,last} (orbax), spectra under <workdir>/svd.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from iddiff.data import create_datamodule
from iddiff.id import collect_spectra, dims_from_spectra, save_spectra
from iddiff.models import create_model, get_score_fn
from iddiff.parallel import make_mesh
from iddiff.sde import get_sde
from iddiff.training import Trainer
from iddiff.training.checkpoints import CheckpointKeeper
from iddiff.training.state import TrainState
from iddiff.training.optim import make_optimizer


def _workdir(config, workdir=None):
    if workdir:
        return workdir
    log = config.logging
    return os.path.join(log.log_path, log.log_name)


def train(config, workdir: str | None = None, resume: bool = True):
    """--mode train (run_lib.py:37-71)."""
    from iddiff.parallel import maybe_initialize_distributed

    # multi-host init (the num_nodes/DDP equivalent of run_lib.py:57-60);
    # no-op single-process, idempotent if main.py already called it
    maybe_initialize_distributed(config)
    if config.data.get("create_dataset", False):
        # offline Haar-pyramid build before training (run_lib.py:39-40)
        from iddiff.data.haar import create_haar_dataset

        create_haar_dataset(config)
    wd = _workdir(config, workdir)
    trainer = Trainer(config, workdir=wd)
    return trainer.fit(resume=resume)


def _restore_eval_params(config, model, datamodule, workdir):
    """Restore EMA params from the best checkpoint, mirroring
    dim_reduction.py:127-141 (load_from_checkpoint + eval mode).  Oracle
    models (ksphere_gt*) run without a checkpoint, like the reference's
    constant-loss ksphere_gt module."""
    from iddiff.training.trainer import example_init_inputs

    rng = jax.random.PRNGKey(int(config.get("seed", 42)))
    loader_batch = next(iter(datamodule.train_dataloader()))
    if getattr(datamodule, "virtual", False):  # index batch → materialize
        loader_batch = datamodule._gen_np(np.asarray(loader_batch))
    x, t = example_init_inputs(config, loader_batch)
    params = model.init({"params": rng, "dropout": rng}, x, t)["params"]
    ckpt_path = config.model.get("checkpoint_path", None) or workdir
    if config.model.name.startswith("ksphere_gt"):
        return params
    optimizer = make_optimizer(config)
    abstract = TrainState.create(params, optimizer.init(params), rng)
    keeper = CheckpointKeeper(ckpt_path)
    # reference analogue: config.model.checkpoint_path can point at ANY
    # .ckpt (dim_reduction.py:127); with directory keepers the selector is
    # model.restore_which ('best' default, or 'last' for the newest step)
    which = config.model.get("restore_which", "best")
    if which not in ("best", "last"):
        raise ValueError(
            f"model.restore_which must be 'best' or 'last', got '{which}'")
    other = "last" if which == "best" else "best"
    try:
        state = keeper.restore(abstract, which=which)
    except Exception as e:  # fall back to the other cadence, then fail
        try:
            state = keeper.restore(abstract, which=other)
        except Exception:
            raise FileNotFoundError(
                f"No checkpoint found under '{ckpt_path}' "
                "(set config.model.checkpoint_path or train first)"
            ) from e
        import logging

        logging.getLogger("iddiff").warning(
            "restore_which='%s' had no checkpoint under '%s'; restored "
            "'%s' (step %d) instead", which, ckpt_path, other,
            int(state.step))
    return state.ema_params


def select_datapoints(train_data: np.ndarray, num: int, seed: int) -> np.ndarray:
    """Seeded-permutation draw of estimator datapoints, matching the
    reference's shuffled-dataloader sampling (dim_reduction.py:154-167).
    First-n would be a biased sample for file-backed datasets with sorted
    orderings (e.g. MNIST sorted by writer)."""
    perm = np.random.default_rng(seed).permutation(train_data.shape[0])
    return train_data[perm[:num]]


def get_manifold_dimension(config, workdir: str | None = None, name: str = None,
                           return_svd: bool = False):
    """--mode manifold_dimension: the paper's headline path
    (dim_reduction.py:116-215), sharded over the device mesh."""
    wd = _workdir(config, workdir)
    datamodule = create_datamodule(config)
    datamodule.setup()
    model = create_model(config)
    sde, sampling_eps = get_sde(config)
    params = _restore_eval_params(config, model, datamodule, wd)

    de = config.get("dim_estimation", None)
    num_datapoints = None
    est_batch = None
    if de is not None:
        num_datapoints = de.get("num_datapoints", None)
        est_batch = de.get("batch_size", None)
    if num_datapoints is None:
        num_datapoints = config.logging.get("svd_points", 26)
    if est_batch is None:
        est_batch = config.training.batch_size

    if getattr(datamodule, "virtual", False):
        # virtual on-device dataset: synthesize just the selected points
        data = jnp.asarray(datamodule.train_datapoints(
            num_datapoints, int(config.get("seed", 42))))
    else:
        data = jnp.asarray(select_datapoints(
            np.asarray(datamodule.train_data), num_datapoints,
            int(config.get("seed", 42))))
    mesh = make_mesh()
    # chunk the datapoint axis: vmapping all P points at once multiplies
    # activation memory by P (prohibitive for image-scale nets); one
    # compiled spectra_fn is reused across chunks.
    n_mesh = mesh.shape["data"]
    chunk = de.get("points_per_chunk", None) if de is not None else None
    if chunk is None:
        chunk = max(n_mesh, min(num_datapoints, 8))
    chunk = min(chunk, data.shape[0])
    use_mesh = mesh if chunk % n_mesh == 0 else None

    from iddiff.id import make_spectra_fn

    spectra_fn, K = make_spectra_fn(
        sde, model, data_shape=data.shape[1:], batch_size=est_batch,
        t=sampling_eps, mesh=use_mesh,
        compute_batch_size=(de.get("compute_batch_size", None)
                            if de is not None else None),
    )
    # NOTE: make_spectra_fn builds its own score_fn from (model, params);
    # the oracle/checkpoint params restored above are passed per call.
    rng = jax.random.PRNGKey(int(config.get("seed", 42)))
    parts = []
    for start in range(0, data.shape[0], chunk):
        piece = data[start: start + chunk]
        if piece.shape[0] < chunk:  # pad tail chunk to the compiled shape
            pad = chunk - piece.shape[0]
            piece = jnp.concatenate([piece, piece[:pad]], axis=0)
            rng, sub = jax.random.split(rng)
            out = spectra_fn(sub, params, piece)[: chunk - pad]
        else:
            rng, sub = jax.random.split(rng)
            out = spectra_fn(sub, params, piece)
        parts.append(np.asarray(out))
    spectra = np.concatenate(parts, axis=0)
    info = {"singular_values": [list(map(float, s)) for s in spectra]}
    rule = (de.get("readout", "reference") if de is not None else "reference")
    tail = (de.get("readout_tail", None) if de is not None else None)
    dims = dims_from_spectra(spectra, rule=rule, tail=tail)
    print(f"[iddiff] estimated dims (n={len(dims)}, rule={rule}): "
          f"median={np.median(dims)}, all={list(dims)}")
    if return_svd:
        return info
    save_spectra(spectra, os.path.join(wd, "svd"), name=name or "svd")
    return dims


def get_conditional_manifold_dimension(config, workdir: str | None = None):
    """--mode conditional_manifold_dimension (dim_reduction.py:12-114):
    per-class spectra over a grid of 12 t-slices in [eps, 0.3]."""
    import pickle
    from pathlib import Path

    wd = _workdir(config, workdir)
    config.data.return_labels = True
    datamodule = create_datamodule(config)
    datamodule.setup()
    model = create_model(config)
    sde, sampling_eps = get_sde(config)
    params = _restore_eval_params(config, model, datamodule, wd)
    score_fn = get_score_fn(sde, model, params, train=False, continuous=True)

    de = config.get("dim_estimation", None)
    num_datapoints = (de.get("num_datapoints", 26) if de is not None else 26)

    # keep label==1 only, like the reference (:57-58)
    labels = datamodule.val_labels
    data = select_datapoints(
        np.asarray(datamodule.val_data[labels == 1]), num_datapoints,
        int(config.get("seed", 42)))
    kept_labels = [1] * len(data)

    times = np.linspace(sampling_eps, 0.3, 12)
    for t_slice in times:
        t_dir = os.path.join(wd, "svd", "%.3f" % t_slice)
        Path(t_dir).mkdir(parents=True, exist_ok=True)
        spectra, _ = collect_spectra(
            jax.random.PRNGKey(int(config.get("seed", 42))),
            sde, score_fn, jnp.asarray(data),
            batch_size=config.training.batch_size, t=float(t_slice),
        )
        with open(os.path.join(t_dir, "labels_svd.pkl"), "wb") as f:
            pickle.dump(
                {"singular_values": [list(map(float, s)) for s in np.asarray(spectra)]},
                f,
            )
        with open(os.path.join(t_dir, "labels.pkl"), "wb") as f:
            pickle.dump({"labels": kept_labels}, f)
        with open(os.path.join(t_dir, "images.pkl"), "wb") as f:
            pickle.dump({"images": np.asarray(data)}, f)
    return wd


def compute_dataset_statistics(config, workdir: str | None = None):
    """--mode compute_dataset_statistics
    (/root/reference/compute_dataset_statistics.py:24-80): dataset mean for
    the VESDE data_mean prior shift, basic range stats, and — for image
    data — the per-band range of Haar HF coefficients."""
    datamodule = create_datamodule(config)
    datamodule.setup()
    data = datamodule.train_data
    stats = {
        "mean": data.mean(axis=0),
        "global_mean": float(data.mean()),
        "min": float(data.min()),
        "max": float(data.max()),
        "std": float(data.std()),
    }
    if data.ndim == 4 and data.shape[1] % 2 == 0:
        from iddiff.nn.haar import haar_forward

        h = np.asarray(haar_forward(jnp.asarray(data[:1024])))
        C = data.shape[-1]
        hf = h[..., C:]
        stats["haar_hf_min"] = float(hf.min())
        stats["haar_hf_max"] = float(hf.max())
        stats["haar_dc_min"] = float(h[..., :C].min())
        stats["haar_dc_max"] = float(h[..., :C].max())
    wd = _workdir(config, workdir)
    os.makedirs(wd, exist_ok=True)
    np.save(os.path.join(wd, "data_mean.npy"), stats["mean"])
    printable = {k: v for k, v in stats.items() if np.isscalar(v)}
    print(f"[iddiff] dataset stats: {printable}")
    return stats


def test(config, workdir: str | None = None):
    """--mode test (run_lib.py:73-100): eval loss on the test split +
    (for paired/SR data) PSNR/SSIM of conditional samples vs ground truth
    (the test_paired callback path, PairedCallback.py:88-232)."""
    wd = _workdir(config, workdir)
    trainer = Trainer(config, workdir=wd)
    try:
        trainer.state = trainer.keeper.restore(trainer.state, which="best")
    except FileNotFoundError:
        pass
    rng = jax.random.PRNGKey(0)
    # full test split by default (the reference evaluates full splits);
    # config.eval.max_batches optionally caps the pass for quick smoke runs.
    # eval_split shards over the global mesh (multi-host-correct, unlike the
    # earlier host-local _to_device path) and weights pad duplicates 0.
    max_batches = config.get("eval", {}).get("max_batches", None)
    loss, first_batch = trainer.eval_split(
        trainer.datamodule.test_dataloader(), rng,
        max_batches=max_batches, label="test")
    paired_batch = first_batch if isinstance(first_batch, tuple) else None
    result = {"test_loss": loss}

    # paired sample metrics are host-local numpy work on the first batch;
    # on a multi-host run first_batch is a non-fully-addressable global
    # jax.Array and np.asarray/slicing would raise (advisor r3 #3), so the
    # block runs single-host only — the split loss above is multi-host-exact
    if paired_batch is not None and trainer.conditional \
            and jax.process_count() == 1:
        from iddiff.analysis.evaluation import (
            batch_ms_ssim, batch_psnr, batch_ssim,
        )
        from iddiff.sampling import get_conditional_sampling_fn

        y, x = paired_batch
        y, x = y[:8], x[:8]
        fn = get_conditional_sampling_fn(
            config, trainer.sde, trainer.model, x.shape, trainer.sampling_eps
        )
        samples = np.asarray(
            fn(jax.random.PRNGKey(1), trainer.state.ema_params, y)
        )
        if samples.ndim >= 3:  # image-like: report SR metrics
            # three metrics like the reference (PSNR/SSIM/LPIPS,
            # PairedCallback.py:88-232); MS-SSIM stands in for LPIPS
            # (weights-free — see analysis/evaluation.py, MIGRATION.md)
            result["test_psnr"] = batch_psnr(samples, np.asarray(x))
            result["test_ssim"] = batch_ssim(samples, np.asarray(x))
            if samples.ndim == 4 and min(samples.shape[1:3]) >= 11:
                result["test_ms_ssim"] = batch_ms_ssim(samples, np.asarray(x))
    print(f"[iddiff] test: {result}")
    return result
