"""Checkpoint IO: torch-free readers for the reference's pretrained weights.

The reference ships two PyTorch-Lightning checkpoints
(reference pretrained/pointnet.ckpt, pretrained/pointnet_tcnn.ckpt; loaded at
reference src/run_e2e.py:232-233).  This module reads the zip+pickle torch
serialization format directly with numpy (no torch import), converts both
architectures into this framework's parameter pytrees, and provides native
``.npz`` save/load for our own state.

tcnn parameter packing (reverse-engineered, validated by exact blob sizes):
``tiny-cuda-nn`` ``NetworkWithInputEncoding`` with Identity encoding and
FullyFusedMLP(n_neurons=64, n_hidden_layers=3) stores a single flat fp32
params vector that concatenates row-major ``[n_out, n_in]`` weight matrices
(no biases), with the input width padded up to a multiple of 16 (the padded
input lanes are fed constant 1.0 by the encoding) and the output width padded
to a multiple of 16 (extra rows unused):

* ``pointnet_backbone.model.params`` (10240) = 64x16 + 64x64 + 64x64 + 16x64
  (6-d input padded to 16, 8-d output padded to 16)
* ``nerf.model.params``             (11264) = 64x32 + 64x64 + 64x64 + 16x64
  (17-d input padded to 32, 1-d output padded to 16)
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially (upcast to float32)
}


class _ODict(dict):
    """Stand-in for collections.OrderedDict in pickled payloads."""


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a torch-serialized (zipfile) checkpoint into plain numpy arrays.

    Unknown classes (Lightning callbacks, omegaconf nodes, ...) are replaced
    with inert stubs; tensors come back as numpy arrays.
    """
    zf = zipfile.ZipFile(path)
    prefix = zf.namelist()[0].split("/")[0]

    def rebuild_tensor(storage, offset, size, stride, *unused):
        arr, dt = storage
        if dt is None:  # bfloat16 -> float32
            arr = (arr.view(np.uint16).astype(np.uint32) << 16).view(np.float32)
        if not size:
            return np.array(arr[offset])
        view = np.lib.stride_tricks.as_strided(
            arr[offset:], shape=tuple(size),
            strides=[s * arr.itemsize for s in stride])
        return np.array(view)

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module == "torch._utils" and name.startswith("_rebuild_tensor"):
                return rebuild_tensor
            if name == "OrderedDict":
                return _ODict
            if module == "torch" and name.endswith("Storage"):
                return ("storage", name)

            class Stub:
                def __init__(self, *a, **k):
                    pass

                def __setstate__(self, state):
                    self._state = state

                def __call__(self, *a, **k):
                    return self

            Stub.__name__ = name
            return Stub

        def persistent_load(self, pid):
            _, storage_type, key, _device, _numel = pid
            name = storage_type[1] if isinstance(storage_type, tuple) else "FloatStorage"
            dt = _STORAGE_DTYPES.get(name, np.float32)
            data = zf.read(f"{prefix}/data/{key}")
            arr = np.frombuffer(data, dtype=np.uint16 if dt is None else dt)
            return (arr, dt)

    return Unpickler(io.BytesIO(zf.read(f"{prefix}/data.pkl"))).load()


# ---------------------------------------------------------------------------
# Converters into framework parameter pytrees
# ---------------------------------------------------------------------------

def _fold_batchnorm(w: np.ndarray, b: np.ndarray, bn: Dict[str, np.ndarray],
                    eps: float = 1e-5):
    """Fold an eval-mode BatchNorm1d into the preceding 1x1 conv (dense layer).

    y = gamma * (Wx + b - mean) / sqrt(var + eps) + beta
      = (gamma/sqrt(var+eps)) * W x + [...]
    """
    gamma, beta = bn["weight"], bn["bias"]
    mean, var = bn["running_mean"], bn["running_var"]
    scale = gamma / np.sqrt(var + eps)
    w_f = w * scale[:, None]
    b_f = (b - mean) * scale + beta
    return w_f.astype(np.float32), b_f.astype(np.float32)


def convert_pointnet_torch(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert the non-tcnn checkpoint (pretrained/pointnet.ckpt).

    PointNetEncoder (reference src/utils/pointnet_utils.py:228-265): four 1x1
    Conv1d + BatchNorm (ReLU after the first three, none after the last); here
    each conv+BN pair is folded into a single dense layer for inference.
    Decoder (reference src/models/fusion/modules.py:534-662): geo_layer0..3 +
    fc_alpha linears with ReLU between.

    Returns {"encoder": {...}, "decoder": {...}} with layers stored as
    ``w`` [in, out] (transposed for x @ w) and ``b`` [out].
    """
    sd = state_dict
    enc = {}
    for i in range(1, 5):
        w = sd[f"pointnet_backbone.conv{i}.weight"][..., 0]  # [out, in]
        b = sd[f"pointnet_backbone.conv{i}.bias"]
        bn = {k: sd[f"pointnet_backbone.bn{i}.{k}"]
              for k in ("weight", "bias", "running_mean", "running_var")}
        w_f, b_f = _fold_batchnorm(w, b, bn)
        wname = "w_out" if i == 4 else f"w{i - 1}"
        bname = "b_out" if i == 4 else f"b{i - 1}"
        enc[wname] = w_f.T.copy()
        enc[bname] = b_f

    dec = {}
    for i in range(4):  # geo_layer0..3 all have ReLU -> all are "hidden"
        dec[f"w{i}"] = sd[f"nerf.geo_layer{i}.weight"].T.copy().astype(np.float32)
        dec[f"b{i}"] = sd[f"nerf.geo_layer{i}.bias"].astype(np.float32)
    dec["w_out"] = sd["nerf.fc_alpha.weight"].T.copy().astype(np.float32)
    dec["b_out"] = sd["nerf.fc_alpha.bias"].astype(np.float32)
    return {"encoder": enc, "decoder": dec}


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def unpack_tcnn_mlp(params: np.ndarray, n_in: int, n_out: int,
                    width: int = 64, n_hidden: int = 3) -> Dict[str, np.ndarray]:
    """De-flatten a tcnn FullyFusedMLP params blob into per-layer matrices.

    Layout: concat of row-major [n_out_layer, n_in_layer] matrices, with
    in/out widths padded to multiples of 16.  Padded *input* lanes receive
    constant 1.0 from the Identity encoding, so the effective first layer is
    ``W[:, :n_in] @ x + W[:, n_in:].sum(-1)`` — the padding columns act as a
    bias.  Returns weights transposed to [in, out] plus that implicit bias.
    """
    in_pad = _round_up(n_in, 16)
    out_pad = _round_up(n_out, 16)
    sizes = [(width, in_pad)] + [(width, width)] * (n_hidden - 1) + [(out_pad, width)]
    expected = sum(o * i for o, i in sizes)
    if params.size != expected:
        raise ValueError(
            f"tcnn blob size {params.size} != expected {expected} "
            f"for MLP {n_in}->{width}x{n_hidden}->{n_out}")
    out: Dict[str, np.ndarray] = {}
    offset = 0
    for li, (o, i) in enumerate(sizes):
        mat = params[offset:offset + o * i].reshape(o, i).astype(np.float32)
        offset += o * i
        if li == 0:
            # padding columns are multiplied by constant 1.0 -> fold into bias
            out["w0"] = mat[:, :n_in].T.copy()
            out["b0"] = mat[:, n_in:].sum(axis=1)
        elif li == len(sizes) - 1:
            out["w_out"] = mat[:n_out, :].T.copy()
            out["b_out"] = np.zeros((n_out,), np.float32)
        else:
            out[f"w{li}"] = mat.T.copy()
            out[f"b{li}"] = np.zeros((o,), np.float32)
    return out


def convert_pointnet_tcnn(state_dict: Dict[str, np.ndarray],
                          feat_dims: int = 8) -> Dict[str, Any]:
    """Convert pretrained/pointnet_tcnn.ckpt (the default e2e checkpoint).

    Encoder: 6 -> 64x3 -> feat_dims; decoder: (9 PE + feat_dims) -> 64x3 -> 1
    (reference src/utils/pointnet_utils.py:269-294,
    src/models/fusion/modules.py:136-176, src/models/tcnn_config.json).
    """
    enc = unpack_tcnn_mlp(state_dict["pointnet_backbone.model.params"],
                          n_in=6, n_out=feat_dims)
    pe_dims = 3 + 2 * 3 * 1  # include_input + 1 frequency (cfg nerf.num_encoding_fn_xyz)
    dec = unpack_tcnn_mlp(state_dict["nerf.model.params"],
                          n_in=pe_dims + feat_dims, n_out=1)
    return {"encoder": enc, "decoder": dec}


def load_pretrained(path: str) -> Dict[str, Any]:
    """Load either reference checkpoint format, auto-detected by its keys."""
    ck = load_torch_checkpoint(path)
    sd = ck["state_dict"] if "state_dict" in ck else ck
    if "pointnet_backbone.model.params" in sd:
        return convert_pointnet_tcnn(sd)
    return convert_pointnet_torch(sd)


# ---------------------------------------------------------------------------
# Native save/load for framework state (flat npz of a nested dict of arrays)
# ---------------------------------------------------------------------------

def save_state(path: str, tree: Dict[str, Any]) -> None:
    flat: Dict[str, np.ndarray] = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}{k}/", v)
        else:
            flat[prefix[:-1]] = np.asarray(node)

    walk("", tree)
    np.savez_compressed(path, **flat)


def load_state(path: str) -> Dict[str, Any]:
    data = np.load(path, allow_pickle=False)
    tree: Dict[str, Any] = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree
