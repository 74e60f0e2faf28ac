"""Sampling-fn dispatch (rebuild of /root/reference/sampling/unconditional.py:13-49)."""
from __future__ import annotations

from .dpm import get_dpm_solver_sampler
from .ode import get_ode_sampler
from .pc import get_pc_sampler


def get_sampling_fn(config, sde, model, shape, eps):
    """config.sampling.method: 'ode' | 'pc' | 'dpm' → sampler(rng, params)."""
    method = config.sampling.method.lower()
    if method in ("dpm", "dpm_solver", "dpm++"):
        # beyond-reference fast path: DPM-Solver++(2M), sampling/dpm.py
        return get_dpm_solver_sampler(
            sde, model, shape,
            steps=int(config.sampling.get("steps", 25)),
            eps=eps,
            continuous=config.training.continuous,
            time_spacing=config.sampling.get("time_spacing", "logsnr"),
            denoise=config.sampling.noise_removal,
        )
    if method == "ode":
        return get_ode_sampler(
            sde, model, shape,
            denoise=config.sampling.noise_removal,
            continuous=config.training.continuous,
            eps=eps,
        )
    if method == "pc":
        return get_pc_sampler(
            sde, model, shape,
            predictor=config.sampling.predictor.lower(),
            corrector=config.sampling.corrector.lower(),
            snr=config.sampling.snr,
            n_steps_each=config.sampling.n_steps_each,
            probability_flow=config.sampling.probability_flow,
            continuous=config.training.continuous,
            denoise=config.sampling.noise_removal,
            eps=eps,
            return_evolution=config.training.get("show_evolution", False),
        )
    raise ValueError(
        f"Sampler method '{method}' unknown (expected 'ode'|'pc'|'dpm')"
    )
