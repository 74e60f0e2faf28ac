"""Import trained REFERENCE (torch) checkpoints into iddiff flax params.

A user of the reference repo can port a trained score net without
retraining:

    params = convert_reference_checkpoint("last.ckpt", config)   # .ckpt
    params = convert_ddpm_state_dict(state_dict, config)          # raw dict

Mapping notes
-------------
The reference's DDPM U-Net (models/ddpm.py:80-213) stores layers in a flat
`all_modules` ModuleList walked by index, while the flax rebuild
(iddiff/models/ddpm_unet.py) relies on auto-scoping.  The reference's
intra-block attribute names (GroupNorm_0, Conv_0, Dense_0, NIN_0, ...,
models/layers.py:567-690) coincide with flax's auto-generated scope names
in our blocks, so only the top-level module walk has to be replicated
here; it mirrors the constructor loop at models/ddpm.py:110-147.

Tensor layouts: torch Linear (out,in) -> Dense kernel (in,out); torch
Conv2d OIHW -> flax HWIO; GroupNorm weight -> scale; NIN W/b match.

Group-count caveat: our blocks use num_groups=min(C//4, 32) vs the
reference's fixed 32 (models/layers.py:637).  These agree whenever
C >= 128 — true for every paper config (nf >= 128) — and the converter
raises if a converted checkpoint would change group counts.

Only numpy/torch-CPU is needed; tensors are converted leaf-by-leaf.
"""
from __future__ import annotations

import numpy as np


def _np(t):
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _dense(w, b):
    return {"kernel": _np(w).T, "bias": _np(b)}


def _conv(w, b):
    return {"kernel": _np(w).transpose(2, 3, 1, 0), "bias": _np(b)}


def _groupnorm(w, b):
    return {"scale": _np(w), "bias": _np(b)}


def _convert_container(sub: dict) -> dict:
    """Convert a reference block's params keyed by its local attribute
    names (GroupNorm_x / Conv_x / Dense_x / NIN_x) — which equal our flax
    scope names — into a flax subtree."""
    out: dict = {}
    locals_ = {}
    for key, tensor in sub.items():
        local, _, leaf = key.partition(".")
        locals_.setdefault(local, {})[leaf] = tensor
    for local, leaves in locals_.items():
        if local.startswith("GroupNorm"):
            out[local] = _groupnorm(leaves["weight"], leaves["bias"])
        elif local.startswith("Conv"):
            out[local] = _conv(leaves["weight"], leaves["bias"])
        elif local.startswith("Dense"):
            out[local] = _dense(leaves["weight"], leaves["bias"])
        elif local.startswith("NIN"):
            out[local] = {"W": _np(leaves["W"]), "b": _np(leaves["b"])}
        else:
            raise ValueError(f"unknown reference submodule '{local}'")
    return out


def _ddpm_walk(config):
    """Ordered (kind, flax_name) for the reference's flat all_modules list,
    mirroring the constructor at models/ddpm.py:100-147."""
    m = config.model
    ch_mult = tuple(m.ch_mult)
    num_res_blocks = m.num_res_blocks
    attn_resolutions = tuple(m.attn_resolutions)
    num_resolutions = len(ch_mult)
    base = config.data.get("effective_image_size", config.data.image_size)
    all_resolutions = [base // (2**i) for i in range(num_resolutions)]
    conditional = m.get("conditional", True)

    entries = []
    counters = {"res": 0, "attn": 0, "down": 0, "up": 0,
                "dense": 0, "conv": 0, "gn": 0}

    def add(kind):
        names = {
            "res": "ResnetBlockDDPM_{}", "attn": "AttnBlock_{}",
            "down": "Downsample_{}", "up": "Upsample_{}",
            "dense": "Dense_{}", "conv": "Conv_{}", "gn": "GroupNorm_{}",
        }
        entries.append((kind, names[kind].format(counters[kind])))
        counters[kind] += 1

    if conditional:
        add("dense"), add("dense")
    add("conv")  # stem
    for i_level in range(num_resolutions):
        for _ in range(num_res_blocks):
            add("res")
            if all_resolutions[i_level] in attn_resolutions:
                add("attn")
        if i_level != num_resolutions - 1:
            add("down")
    add("res"), add("attn"), add("res")  # middle
    for i_level in reversed(range(num_resolutions)):
        for _ in range(num_res_blocks + 1):
            add("res")
        if all_resolutions[i_level] in attn_resolutions:
            add("attn")
        if i_level != 0:
            add("up")
    add("gn"), add("conv")  # output head
    return entries


def _check_groups(config):
    nf = config.model.nf
    min_ch = nf * min(tuple(config.model.ch_mult))
    if min(min_ch // 4, 32) != 32:
        raise ValueError(
            f"group-count mismatch: reference GroupNorm uses 32 groups but "
            f"iddiff uses min(C//4,32)={min(min_ch // 4, 32)} at C={min_ch}; "
            f"checkpoints are only portable when every channel count is "
            f">= 128 (nf*min(ch_mult) >= 128)")


def convert_ddpm_state_dict(state_dict: dict, config) -> dict:
    """Reference `ddpm` net state_dict -> flax params for models.ddpm `DDPM`."""
    _check_groups(config)
    sd = {k[len("all_modules."):]: v for k, v in state_dict.items()
          if k.startswith("all_modules.")}
    if not sd:
        raise ValueError("no 'all_modules.*' keys — not a reference ddpm "
                         "state_dict?")
    by_index: dict = {}
    for key, tensor in sd.items():
        idx, _, rest = key.partition(".")
        by_index.setdefault(int(idx), {})[rest] = tensor

    params: dict = {}
    entries = _ddpm_walk(config)
    if len(by_index) != len(entries):
        raise ValueError(
            f"module-count mismatch: checkpoint has {len(by_index)} "
            f"all_modules entries, config implies {len(entries)} — wrong "
            f"config for this checkpoint?")
    for idx, (kind, flax_name) in enumerate(entries):
        sub = by_index[idx]
        if kind == "dense":
            params[flax_name] = _dense(sub["weight"], sub["bias"])
        elif kind == "conv":
            params[flax_name] = _conv(sub["weight"], sub["bias"])
        elif kind == "gn":
            params[flax_name] = _groupnorm(sub["weight"], sub["bias"])
        else:
            params[flax_name] = _convert_container(sub)
    return params


def convert_fcn_state_dict(state_dict: dict, config) -> dict:
    """Reference `fcn` MLP state_dict -> flax params for models.fcn `FCN`.

    The reference Sequential interleaves Linear/Dropout/ELU (fcn.py:19-30);
    only Linear layers carry params and map in order onto _MLP's Dense_i.
    """
    linear_idx = sorted(
        {int(k.split(".")[1]) for k in state_dict
         if k.startswith("mlp.") and k.endswith(".weight")})
    if not linear_idx:
        raise ValueError("no 'mlp.*.weight' keys — not a reference fcn "
                         "state_dict?")
    net: dict = {}
    for i, torch_i in enumerate(linear_idx):
        net[f"Dense_{i}"] = _dense(state_dict[f"mlp.{torch_i}.weight"],
                                   state_dict[f"mlp.{torch_i}.bias"])
    return {"net": net}


def _torch_leaf_groups(state_dict):
    """Group an ORDERED torch state_dict into per-leaf-module param dicts,
    preserving registration order (a leaf's params are registered
    back-to-back, so consecutive keys with the same prefix form one leaf)."""
    groups = []
    for key, tensor in state_dict.items():
        prefix, _, leaf = key.rpartition(".")
        if groups and groups[-1][0] == prefix:
            groups[-1][1][leaf] = tensor
        else:
            groups.append((prefix, {leaf: tensor}))
    return groups


def _convert_torch_leaf(leaves: dict, flax_param_names: set, prefix: str):
    """Convert one torch leaf-module's params to the flax leaf layout."""
    if flax_param_names in ({"kernel", "bias"}, {"kernel"}):
        w = _np(leaves["weight"])
        out = {"kernel": w.transpose(2, 3, 1, 0) if w.ndim == 4 else w.T}
        if "bias" in flax_param_names:
            out["bias"] = _np(leaves["bias"])
        elif "bias" in leaves:
            raise ValueError(
                f"torch module '{prefix}' has a bias but the flax leaf is "
                f"bias-free (use_bias=False) — refusing to drop it silently")
        return out
    if flax_param_names == {"scale", "bias"}:
        return _groupnorm(leaves["weight"], leaves["bias"])
    if flax_param_names == {"W", "b"}:
        return {"W": _np(leaves["W"]), "b": _np(leaves["b"])}
    if flax_param_names == {"W"}:
        return {"W": _np(leaves["W"])}
    raise ValueError(
        f"don't know how to fill flax leaf {sorted(flax_param_names)} "
        f"from torch module '{prefix}' with params {sorted(leaves)}")


def convert_by_structure(state_dict: dict, model, example_args) -> dict:
    """Generic torch->flax conversion by zipping BOTH frameworks' leaf
    modules in order.

    Works for any model whose flax __call__ order equals the reference's
    module registration order — true for the module-list U-Nets (ddpm,
    ncsnpp, ncsnv2, ...) whose constructors mirror their forward walk.
    The torch side is read straight from the ordered state_dict; the flax
    side from Module.module_paths (DFS call order).  Every leaf is
    shape-checked against a fresh init; misalignment raises instead of
    silently mis-assigning.
    """
    import jax
    import jax.numpy as jnp

    init_vars = model.init(jax.random.PRNGKey(0), *example_args)
    init_params = init_vars["params"]
    paths = model.module_paths(jax.random.PRNGKey(0), *example_args)

    def node_at(tree, path):
        node = tree
        for part in path.split("/"):
            if part:
                node = node.get(part) if isinstance(node, dict) else None
            if node is None:
                return None
        return node

    flax_leaves = []  # (path, {name: shape})
    for path in paths:
        if not path:
            continue
        node = node_at(init_params, path)
        if not isinstance(node, dict):
            continue
        direct = {k: v for k, v in node.items() if hasattr(v, "shape")}
        if direct:
            flax_leaves.append((path, {k: v.shape for k, v in direct.items()}))

    torch_leaves = _torch_leaf_groups(state_dict)
    if len(torch_leaves) != len(flax_leaves):
        t_names = [p for p, _ in torch_leaves]
        f_names = [p for p, _ in flax_leaves]
        raise ValueError(
            f"leaf-count mismatch: torch has {len(torch_leaves)} "
            f"param-bearing modules, flax init has {len(flax_leaves)}.\n"
            f"torch: {t_names[:8]}...\nflax: {f_names[:8]}...")

    # tree_map(identity) rebuilds fresh mutable dicts; leaves are overwritten
    out = jax.tree_util.tree_map(lambda x: x, init_params)
    for (t_prefix, t_leaves), (f_path, f_shapes) in zip(torch_leaves,
                                                        flax_leaves):
        converted = _convert_torch_leaf(t_leaves, set(f_shapes), t_prefix)
        for name, arr in converted.items():
            if tuple(arr.shape) != tuple(f_shapes[name]):
                raise ValueError(
                    f"shape mismatch at torch '{t_prefix}' -> flax "
                    f"'{f_path}/{name}': {arr.shape} vs {f_shapes[name]}")
        node = out
        parts = f_path.split("/")
        for part in parts[:-1]:
            node = node[part]
        node[parts[-1]] = {k: jnp.asarray(v) for k, v in converted.items()}
    return out


def extract_ema_state_dict(checkpoint: dict) -> dict | None:
    """Rebuild a NAMED state_dict holding the EMA weights from a reference
    Lightning checkpoint.

    The reference's EMAOptimizer stores the EMA shadow as a flat tuple in
    `parameters()` order inside `optimizer_states`
    (lightning_callbacks/ema.py:300-325); `parameters()` order equals
    state_dict key order for the supported families (no buffers), so the
    tuple can be re-keyed by zipping.  Returns None when the checkpoint has
    no EMA state.
    """
    sd = checkpoint.get("state_dict")
    if sd is None:
        return None
    ema = None
    for st in checkpoint.get("optimizer_states") or []:
        if isinstance(st, dict) and "ema" in st:
            ema = st["ema"]
            break
    if ema is None:
        return None
    names = list(sd)
    if len(names) != len(ema):
        raise ValueError(
            f"EMA tuple has {len(ema)} tensors but state_dict has "
            f"{len(names)} entries — buffers present? Cannot re-key safely.")
    return dict(zip(names, ema))


def convert_reference_checkpoint(path_or_state, config,
                                 model_name: str | None = None,
                                 prefer_ema: bool = True) -> dict:
    """Convert a reference Lightning .ckpt (or raw state_dict) to flax params.

    Lightning checkpoints nest the net under 'state_dict' with a
    'score_model.' prefix (lightning_modules/BaseSdeGenerativeModel.py:21).
    With prefer_ema=True (default) the EMA shadow weights stored by the
    reference's EMAOptimizer are used when present — these are the weights
    the reference itself evaluates/samples with (ema.py:65-90); pass
    prefer_ema=False for the raw training weights.
    """
    state = path_or_state
    if isinstance(state, (str, bytes)):
        import torch

        state = torch.load(state, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        ema_sd = extract_ema_state_dict(state) if prefer_ema else None
        state = ema_sd if ema_sd is not None else state["state_dict"]
    state = {
        (k[len("score_model."):] if k.startswith("score_model.") else k): v
        for k, v in state.items()
    }
    name = model_name or config.model.name
    if name.startswith("ddpm"):
        return convert_ddpm_state_dict(state, config)
    if name.startswith("fcn"):
        return convert_fcn_state_dict(state, config)
    if name.startswith("ncsnpp"):
        import jax.numpy as jnp

        from iddiff.models import create_model

        model = create_model(config)
        size = config.data.get("effective_image_size",
                               config.data.image_size)
        ch = config.model.get("input_channels", config.data.num_channels)
        example = (jnp.zeros((1, size, size, ch)), jnp.zeros((1,)))
        return convert_by_structure(state, model, example)
    raise NotImplementedError(
        f"no torch->flax converter for model '{name}' "
        f"(supported: ddpm, fcn, ncsnpp)")
