"""Checkpoint weight-file interop with the reference's torch format.

The reference persists model weights as torch ``state_dict`` pickles
(``conv_ae_model.py:101-133``, ``linear_model.py:78-105``).  To keep model
folders interchangeable, this module converts between our NHWC/HWIO param
pytrees and torch's NCHW/OIHW state dicts, handling:

 * conv kernels: OIHW <-> HWIO transpose
 * transposed-conv kernels: torch stores (I, O, kh, kw); our kernels are the
   spatially-flipped HWIO kernel of the equivalent forward conv
 * flatten-adjacent Linear weights: torch flattens NCHW (C-major "CYX" order),
   we flatten NHWC ("YXC" order) — rows/columns are permuted so that the two
   models compute identical functions on the same data
 * BatchNorm: weight/bias/running_mean/running_var/num_batches_tracked

Key naming matches the reference modules exactly (``encoder.py:39-58``
Sequential indices; ``decoder.py:31-50``; ``linear.py:41-45``), so
checkpoints written here load in the reference library and vice versa.

If torch is unavailable the same state dicts are stored as ``.npz`` with
identical keys (documented fallback; reference interop then requires torch).
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - environment dependent
    import torch

    HAVE_TORCH = True
except ModuleNotFoundError:  # pragma: no cover
    torch = None
    HAVE_TORCH = False


# --------------------------------------------------------------------------
# low-level tensor layout converters (numpy in, numpy out)
# --------------------------------------------------------------------------

def conv_w_from_torch(w):
    """(O, I, kh, kw) -> (kh, kw, I, O)"""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def conv_w_to_torch(w):
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def convT_w_from_torch(w):
    """(I, O, kh, kw) -> flipped (kh, kw, I, O)"""
    w = np.transpose(w, (2, 3, 0, 1))
    return np.ascontiguousarray(w[::-1, ::-1])


def convT_w_to_torch(w):
    w = np.ascontiguousarray(np.asarray(w)[::-1, ::-1])
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def fc_in_from_torch(w, cyx):
    """Linear applied right after a flatten.

    torch: (out, C*Y*X) with C-major columns; ours: (Y*X*C, out).
    """
    c, y, x = cyx
    out = w.shape[0]
    w = w.reshape(out, c, y, x).transpose(0, 2, 3, 1).reshape(out, y * x * c)
    return np.ascontiguousarray(w.T)


def fc_in_to_torch(w, cyx):
    c, y, x = cyx
    out = w.shape[1]
    w = np.asarray(w).T.reshape(out, y, x, c).transpose(0, 3, 1, 2)
    return np.ascontiguousarray(w.reshape(out, c * y * x))


def fc_out_from_torch(w, cyx):
    """Linear whose *output* is unflattened.

    torch: (C*Y*X, in) with C-major rows; ours: (in, Y*X*C).
    """
    c, y, x = cyx
    fin = w.shape[1]
    w = w.reshape(c, y, x, fin).transpose(1, 2, 0, 3).reshape(y * x * c, fin)
    return np.ascontiguousarray(w.T)


def fc_out_to_torch(w, cyx):
    c, y, x = cyx
    fin = w.shape[0]
    w = np.asarray(w).T.reshape(y, x, c, fin).transpose(2, 0, 1, 3)
    return np.ascontiguousarray(w.reshape(c * y * x, fin))


def vec_cyx_from_torch(b, cyx):
    c, y, x = cyx
    return np.ascontiguousarray(
        b.reshape(c, y, x).transpose(1, 2, 0).reshape(-1)
    )


def vec_cyx_to_torch(b, cyx):
    c, y, x = cyx
    return np.ascontiguousarray(
        np.asarray(b).reshape(y, x, c).transpose(2, 0, 1).reshape(-1)
    )


def plain_fc_from_torch(w):
    """(out, in) -> (in, out)"""
    return np.ascontiguousarray(w.T)


def plain_fc_to_torch(w):
    return np.ascontiguousarray(np.asarray(w).T)


# --------------------------------------------------------------------------
# state-dict file IO
# --------------------------------------------------------------------------

def save_state_dict(path, sd: dict):
    """Write a {key: numpy array} mapping as a torch state_dict pickle."""
    if HAVE_TORCH:
        tensors = {}
        for k, v in sd.items():
            arr = np.array(v, copy=True)  # writable copy silences torch warning
            t = torch.from_numpy(arr)
            if k.endswith("num_batches_tracked"):
                t = t.to(torch.int64)
            tensors[k] = t
        torch.save(tensors, path)
    else:  # pragma: no cover
        # write through a file handle so numpy does not append ".npz"
        with open(path, "wb") as f:
            np.savez(f, **{k: np.asarray(v) for k, v in sd.items()})


def load_state_dict(path) -> dict:
    if HAVE_TORCH:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.detach().cpu().numpy() for k, v in sd.items()}
    else:  # pragma: no cover
        with np.load(path) as z:
            return {k: z[k] for k in z.files}


# --------------------------------------------------------------------------
# module-level converters
# --------------------------------------------------------------------------

def _bn_to_sd(sd, prefix, bp, bs):
    sd[prefix + ".weight"] = np.asarray(bp["scale"])
    sd[prefix + ".bias"] = np.asarray(bp["bias"])
    sd[prefix + ".running_mean"] = np.asarray(bs["mean"])
    sd[prefix + ".running_var"] = np.asarray(bs["var"])
    sd[prefix + ".num_batches_tracked"] = np.asarray(bs["count"], dtype=np.int64)


def _bn_from_sd(sd, prefix):
    import jax  # local: keep module import light (numpy/torch-only paths)

    bp = {
        "scale": sd[prefix + ".weight"].astype(np.float32),
        "bias": sd[prefix + ".bias"].astype(np.float32),
    }
    bs = {
        "mean": sd[prefix + ".running_mean"].astype(np.float32),
        "var": sd[prefix + ".running_var"].astype(np.float32),
        # match bn_init's count dtype (int64 under jax_enable_x64) so
        # loaded and freshly-initialized BN state pytrees are
        # interchangeable (orbax templates, jit cache keys)
        "count": sd.get(
            prefix + ".num_batches_tracked", np.zeros((), np.int64)
        ).astype(
            np.int64 if jax.config.jax_enable_x64 else np.int32
        ),
    }
    return bp, bs


def conv_encoder_to_state_dict(module, params, state) -> dict:
    """ConvEncoder pytree -> reference Encoder state dict (encoder.py:39-58)."""
    sd = {}
    for i, (cp, bp, bs) in enumerate(
        zip(params["convs"], params["bns"], state["bns"])
    ):
        sd[f"encoder_cnn.{3*i}.weight"] = conv_w_to_torch(cp["w"])
        sd[f"encoder_cnn.{3*i}.bias"] = np.asarray(cp["b"])
        _bn_to_sd(sd, f"encoder_cnn.{3*i+1}", bp, bs)
    cyx = module.flat_dims
    sd["encoder_lin.0.weight"] = fc_in_to_torch(params["fc1"]["w"], cyx)
    sd["encoder_lin.0.bias"] = np.asarray(params["fc1"]["b"])
    sd["encoder_lin.2.weight"] = plain_fc_to_torch(params["fc2"]["w"])
    sd["encoder_lin.2.bias"] = np.asarray(params["fc2"]["b"])
    return sd


def conv_encoder_from_state_dict(module, sd) -> tuple:
    params = {"convs": [], "bns": []}
    state = {"bns": []}
    for i in range(len(module.layers)):
        params["convs"].append(
            {
                "w": conv_w_from_torch(sd[f"encoder_cnn.{3*i}.weight"]).astype(
                    np.float32
                ),
                "b": sd[f"encoder_cnn.{3*i}.bias"].astype(np.float32),
            }
        )
        bp, bs = _bn_from_sd(sd, f"encoder_cnn.{3*i+1}")
        params["bns"].append(bp)
        state["bns"].append(bs)
    cyx = module.flat_dims
    params["fc1"] = {
        "w": fc_in_from_torch(sd["encoder_lin.0.weight"], cyx).astype(np.float32),
        "b": sd["encoder_lin.0.bias"].astype(np.float32),
    }
    params["fc2"] = {
        "w": plain_fc_from_torch(sd["encoder_lin.2.weight"]).astype(np.float32),
        "b": sd["encoder_lin.2.bias"].astype(np.float32),
    }
    return params, state


def conv_decoder_to_state_dict(module, params, state) -> dict:
    """ConvDecoder pytree -> reference Decoder state dict (decoder.py:31-50)."""
    sd = {}
    cyx = module.unflat_dims
    sd["decoder_lin.0.weight"] = plain_fc_to_torch(params["fc1"]["w"])
    sd["decoder_lin.0.bias"] = np.asarray(params["fc1"]["b"])
    sd["decoder_lin.2.weight"] = fc_out_to_torch(params["fc2"]["w"], cyx)
    sd["decoder_lin.2.bias"] = vec_cyx_to_torch(params["fc2"]["b"], cyx)
    n_layers = len(module.layers)
    for i, cp in enumerate(params["convs"]):
        sd[f"decoder_conv.{3*i}.weight"] = convT_w_to_torch(cp["w"])
        sd[f"decoder_conv.{3*i}.bias"] = np.asarray(cp["b"])
        if i != n_layers - 1:
            _bn_to_sd(
                sd, f"decoder_conv.{3*i+1}", params["bns"][i], state["bns"][i]
            )
    return sd


def conv_decoder_from_state_dict(module, sd) -> tuple:
    cyx = module.unflat_dims
    params = {
        "fc1": {
            "w": plain_fc_from_torch(sd["decoder_lin.0.weight"]).astype(np.float32),
            "b": sd["decoder_lin.0.bias"].astype(np.float32),
        },
        "fc2": {
            "w": fc_out_from_torch(sd["decoder_lin.2.weight"], cyx).astype(
                np.float32
            ),
            "b": vec_cyx_from_torch(sd["decoder_lin.2.bias"], cyx).astype(
                np.float32
            ),
        },
        "convs": [],
        "bns": [],
    }
    state = {"bns": []}
    n_layers = len(module.layers)
    for i in range(n_layers):
        params["convs"].append(
            {
                "w": convT_w_from_torch(sd[f"decoder_conv.{3*i}.weight"]).astype(
                    np.float32
                ),
                "b": sd[f"decoder_conv.{3*i}.bias"].astype(np.float32),
            }
        )
        if i != n_layers - 1:
            bp, bs = _bn_from_sd(sd, f"decoder_conv.{3*i+1}")
            params["bns"].append(bp)
            state["bns"].append(bs)
    return params, state


def linear_to_state_dict(module, params) -> dict:
    """LinearMap pytree -> reference Linear state dict (linear.py:41-45)."""
    w = params["fc"]["w"]
    in_cyx = tuple(module.input_shape)
    out_cyx = tuple(module.output_shape)
    # permute our (Y1X1C1, Y2X2C2) into torch's (C2Y2X2, C1Y1X1)
    w_t = fc_in_to_torch(
        fc_out_to_torch(w, out_cyx).T, in_cyx
    )
    return {
        "linear.1.weight": w_t,
        "linear.1.bias": vec_cyx_to_torch(params["fc"]["b"], out_cyx),
    }


def linear_from_state_dict(module, sd) -> dict:
    in_cyx = tuple(module.input_shape)
    out_cyx = tuple(module.output_shape)
    w_t = sd["linear.1.weight"]
    w = fc_out_from_torch(
        fc_in_from_torch(w_t, in_cyx).T, out_cyx
    )
    return {
        "fc": {
            "w": w.astype(np.float32),
            "b": vec_cyx_from_torch(sd["linear.1.bias"], out_cyx).astype(
                np.float32
            ),
        }
    }


def _attn_from_sd(sd, prefix):
    """ChannelAttention: torch 1x1 Conv2d (out,in,1,1) no-bias -> dense mats."""
    fc1 = sd[prefix + ".fc1.weight"]  # (hidden, C, 1, 1)
    fc2 = sd[prefix + ".fc2.weight"]  # (C, hidden, 1, 1)
    return {
        "fc1": np.ascontiguousarray(fc1[:, :, 0, 0].T.astype(np.float32)),
        "fc2": np.ascontiguousarray(fc2[:, :, 0, 0].T.astype(np.float32)),
    }


def _attn_to_sd(sd, prefix, ap):
    sd[prefix + ".fc1.weight"] = np.ascontiguousarray(
        np.asarray(ap["fc1"]).T[:, :, None, None]
    )
    sd[prefix + ".fc2.weight"] = np.ascontiguousarray(
        np.asarray(ap["fc2"]).T[:, :, None, None]
    )


def unet_encoder_from_state_dict(module, sd) -> tuple:
    """Reference UNET Encoder state dict -> UNetEncoder pytree.

    Key layout per ``unet.py:73-100``: ``encoder_cnn`` ModuleList with 4
    entries per layer (Conv at 4i, BN at 4i+1); ``encoder_lin``: Linear 0,
    BatchNorm1d 1, Linear 4.
    """
    params = {"convs": [], "bns": []}
    state = {"bns": []}
    for i in range(len(module.layers)):
        params["convs"].append(
            {
                "w": conv_w_from_torch(sd[f"encoder_cnn.{4*i}.weight"]).astype(
                    np.float32
                ),
                "b": sd[f"encoder_cnn.{4*i}.bias"].astype(np.float32),
            }
        )
        bp, bs = _bn_from_sd(sd, f"encoder_cnn.{4*i+1}")
        params["bns"].append(bp)
        state["bns"].append(bs)
    cyx = module.flat_dims
    params["fc1"] = {
        "w": fc_in_from_torch(sd["encoder_lin.0.weight"], cyx).astype(np.float32),
        "b": sd["encoder_lin.0.bias"].astype(np.float32),
    }
    fbp, fbs = _bn_from_sd(sd, "encoder_lin.1")
    params["fc_bn"] = fbp
    state["fc_bn"] = fbs
    params["fc2"] = {
        "w": plain_fc_from_torch(sd["encoder_lin.4.weight"]).astype(np.float32),
        "b": sd["encoder_lin.4.bias"].astype(np.float32),
    }
    return params, state


def unet_encoder_to_state_dict(module, params, state) -> dict:
    sd = {}
    for i, (cp, bp, bs) in enumerate(
        zip(params["convs"], params["bns"], state["bns"])
    ):
        sd[f"encoder_cnn.{4*i}.weight"] = conv_w_to_torch(cp["w"])
        sd[f"encoder_cnn.{4*i}.bias"] = np.asarray(cp["b"])
        _bn_to_sd(sd, f"encoder_cnn.{4*i+1}", bp, bs)
    cyx = module.flat_dims
    sd["encoder_lin.0.weight"] = fc_in_to_torch(params["fc1"]["w"], cyx)
    sd["encoder_lin.0.bias"] = np.asarray(params["fc1"]["b"])
    _bn_to_sd(sd, "encoder_lin.1", params["fc_bn"], state["fc_bn"])
    sd["encoder_lin.4.weight"] = plain_fc_to_torch(params["fc2"]["w"])
    sd["encoder_lin.4.bias"] = np.asarray(params["fc2"]["b"])
    return sd


def unet_decoder_compat_from_state_dict(module, sd) -> tuple:
    """Reference UNET Decoder state dict -> UNetDecoder(compat_concat) pytree.

    Key layout per ``unet.py:114-147``: ``decoder_lin`` Linear 0 / BN1d 1 /
    Linear 4; ``decoder_conv`` ModuleList with ConvT at 4i and BN(2*out) at
    4i+1 for non-last layers, bare ConvT for the last;
    ``attention_layers.{j}`` SE gates.
    """
    cyx = module.unflat_dims
    params = {
        "fc1": {
            "w": plain_fc_from_torch(sd["decoder_lin.0.weight"]).astype(np.float32),
            "b": sd["decoder_lin.0.bias"].astype(np.float32),
        },
        "fc2": {
            "w": fc_out_from_torch(sd["decoder_lin.4.weight"], cyx).astype(
                np.float32
            ),
            "b": vec_cyx_from_torch(sd["decoder_lin.4.bias"], cyx).astype(
                np.float32
            ),
        },
        "convs": [],
        "bns": [],
        "attn": [],
        "skip_proj": [],
        "fuse": [],
    }
    state = {"bns": []}
    fbp, fbs = _bn_from_sd(sd, "decoder_lin.1")
    params["fc_bn"] = fbp
    state["fc_bn"] = fbs
    n_layers = len(module.layers)
    attn_idx = 0
    for i in range(n_layers):
        params["convs"].append(
            {
                "w": convT_w_from_torch(sd[f"decoder_conv.{4*i}.weight"]).astype(
                    np.float32
                ),
                "b": sd[f"decoder_conv.{4*i}.bias"].astype(np.float32),
            }
        )
        if i != n_layers - 1:
            if f"attention_layers.{attn_idx}.fc1.weight" in sd:
                params["attn"].append(
                    _attn_from_sd(sd, f"attention_layers.{attn_idx}")
                )
                attn_idx += 1
            else:
                params["attn"].append(None)
            params["skip_proj"].append(None)
            params["fuse"].append(None)
            bp, bs = _bn_from_sd(sd, f"decoder_conv.{4*i+1}")
            params["bns"].append(bp)
            state["bns"].append(bs)
    return params, state


def unet_decoder_compat_to_state_dict(module, params, state) -> dict:
    cyx = module.unflat_dims
    sd = {
        "decoder_lin.0.weight": plain_fc_to_torch(params["fc1"]["w"]),
        "decoder_lin.0.bias": np.asarray(params["fc1"]["b"]),
        "decoder_lin.4.weight": fc_out_to_torch(params["fc2"]["w"], cyx),
        "decoder_lin.4.bias": vec_cyx_to_torch(params["fc2"]["b"], cyx),
    }
    _bn_to_sd(sd, "decoder_lin.1", params["fc_bn"], state["fc_bn"])
    n_layers = len(module.layers)
    attn_idx = 0
    for i in range(n_layers):
        cp = params["convs"][i]
        sd[f"decoder_conv.{4*i}.weight"] = convT_w_to_torch(cp["w"])
        sd[f"decoder_conv.{4*i}.bias"] = np.asarray(cp["b"])
        if i != n_layers - 1:
            if params["attn"][i] is not None:
                _attn_to_sd(sd, f"attention_layers.{attn_idx}", params["attn"][i])
                attn_idx += 1
            _bn_to_sd(
                sd, f"decoder_conv.{4*i+1}", params["bns"][i], state["bns"][i]
            )
    return sd


def var_encoder_to_state_dict(module, params, state) -> dict:
    """VarAEEncoder pytree -> state dict.

    The reference's VarAEModel source is missing upstream (SURVEY.md §2.11);
    this format reuses the reference Encoder key naming for the shared conv
    trunk + first FC (``encoder_cnn.*``, ``encoder_lin.0.*``) and adds
    ``fc_mu.*`` / ``fc_logvar.*`` torch-Linear-layout heads.
    """
    sd = {}
    for i, (cp, bp, bs) in enumerate(
        zip(params["convs"], params["bns"], state["bns"])
    ):
        sd[f"encoder_cnn.{3*i}.weight"] = conv_w_to_torch(cp["w"])
        sd[f"encoder_cnn.{3*i}.bias"] = np.asarray(cp["b"])
        _bn_to_sd(sd, f"encoder_cnn.{3*i+1}", bp, bs)
    c, y, x = module.layers[-1].get_output_dimensions()
    sd["encoder_lin.0.weight"] = fc_in_to_torch(params["fc1"]["w"], (c, y, x))
    sd["encoder_lin.0.bias"] = np.asarray(params["fc1"]["b"])
    sd["fc_mu.weight"] = plain_fc_to_torch(params["fc_mu"]["w"])
    sd["fc_mu.bias"] = np.asarray(params["fc_mu"]["b"])
    sd["fc_logvar.weight"] = plain_fc_to_torch(params["fc_logvar"]["w"])
    sd["fc_logvar.bias"] = np.asarray(params["fc_logvar"]["b"])
    return sd


def var_encoder_from_state_dict(module, sd) -> tuple:
    params = {"convs": [], "bns": []}
    state = {"bns": []}
    for i in range(len(module.layers)):
        params["convs"].append(
            {
                "w": conv_w_from_torch(sd[f"encoder_cnn.{3*i}.weight"]).astype(
                    np.float32
                ),
                "b": sd[f"encoder_cnn.{3*i}.bias"].astype(np.float32),
            }
        )
        bp, bs = _bn_from_sd(sd, f"encoder_cnn.{3*i+1}")
        params["bns"].append(bp)
        state["bns"].append(bs)
    c, y, x = module.layers[-1].get_output_dimensions()
    params["fc1"] = {
        "w": fc_in_from_torch(sd["encoder_lin.0.weight"], (c, y, x)).astype(
            np.float32
        ),
        "b": sd["encoder_lin.0.bias"].astype(np.float32),
    }
    params["fc_mu"] = {
        "w": plain_fc_from_torch(sd["fc_mu.weight"]).astype(np.float32),
        "b": sd["fc_mu.bias"].astype(np.float32),
    }
    params["fc_logvar"] = {
        "w": plain_fc_from_torch(sd["fc_logvar.weight"]).astype(np.float32),
        "b": sd["fc_logvar.bias"].astype(np.float32),
    }
    return params, state


# --------------------------------------------------------------------------
# generic pytree <-> flat state dict (for modules with no reference format:
# UNet with skip projections, VarAE heads)
# --------------------------------------------------------------------------

def flatten_pytree(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        if not tree:
            out[prefix + "__empty_dict__"] = np.zeros((0,), np.float32)
            return out
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            out[prefix + "__empty_list__"] = np.zeros((0,), np.float32)
            return out
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}."))
    elif tree is None:
        out[prefix + "__none__"] = np.zeros((0,), np.float32)
    else:
        out[prefix.rstrip(".")] = np.asarray(tree)
    return out


def unflatten_pytree(flat: dict):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        last = parts[-1]
        node[last] = None if last == "__none__" else value

    def normalise(node):
        if not isinstance(node, dict):
            return node
        if node.keys() and all(k.isdigit() for k in node.keys()):
            return [
                normalise(node[k]) for k in sorted(node.keys(), key=int)
            ]
        if set(node.keys()) == {"__none__"}:
            return None
        if set(node.keys()) == {"__empty_list__"}:
            return []
        if set(node.keys()) == {"__empty_dict__"}:
            return {}
        return {k: normalise(v) for k, v in node.items()}

    return normalise(root)
