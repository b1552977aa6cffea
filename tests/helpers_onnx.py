"""Paddle-export-style ONNX serialization of a torch mirror.

The environment has no network and no ``onnx`` package, so a real
Paddle2ONNX artifact (or torch.onnx.export, which needs the onnx package
to finalize) cannot be produced in-test. What the converters consume from
an .onnx file is exactly its initializer section; this helper reproduces
that section with the properties real Paddle exports have:

- EXECUTION order (paddle2onnx walks the inference program op by op, so
  initializers appear in graph order — reproduced here by tracing the
  torch mirror with forward hooks, not by state_dict/definition order,
  which differs e.g. in CSPLayer where final_conv is defined before
  blocks but runs after),
- anonymous machine names (conv2d_N.w_0, batch_norm_N.w_0 ... — the
  matcher must not depend on source names),
- torch/Paddle native layouts (conv OIHW, linear (out, in)),
- BatchNorm kept unfused as scale/bias/mean/var quadruples (Paddle
  inference exports keep BatchNormalization nodes).

The round trip .onnx bytes -> convert.onnx_reader -> onnx_shape_matcher
-> flax -> forward parity is the loop a real downloaded model.onnx takes
(tools/convert_weights.py --checkpoint model.onnx).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _np(v) -> np.ndarray:
    return v.detach().cpu().numpy()


def paddle_style_onnx_bytes(tmodel, sample_input) -> bytes:
    import torch

    from pdf_table_tpu.convert.onnx_reader import encode_test_onnx

    visited: List = []

    def hook(mod, _inp, _out):
        if mod not in visited:
            visited.append(mod)

    handles = []
    for m in tmodel.modules():
        if not list(m.children()) and (dict(m.named_parameters(recurse=False))
                                       or dict(m.named_buffers(
                                           recurse=False))):
            handles.append(m.register_forward_hook(hook))
    try:
        with torch.no_grad():
            tmodel(sample_input)
    finally:
        for h in handles:
            h.remove()

    # leaf modules that never ran (shouldn't happen for inference mirrors)
    ran = set(id(m) for m in visited)
    for m in tmodel.modules():
        if not list(m.children()) and id(m) not in ran \
                and dict(m.named_parameters(recurse=False)):
            visited.append(m)

    tensors: Dict[str, np.ndarray] = {}
    counts = {"conv2d": 0, "batch_norm": 0, "linear": 0, "tensor": 0}

    def put(kind: str, suffix: str, arr: np.ndarray) -> None:
        tensors[f"{kind}_{counts[kind]}.{suffix}"] = \
            arr.astype(np.float32)

    import torch.nn as tnn

    for m in visited:
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d,
                          tnn.BatchNorm3d)):
            put("batch_norm", "w_0", _np(m.weight))
            put("batch_norm", "b_0", _np(m.bias))
            put("batch_norm", "w_1", _np(m.running_mean))
            put("batch_norm", "w_2", _np(m.running_var))
            counts["batch_norm"] += 1
        elif isinstance(m, (tnn.Conv2d, tnn.ConvTranspose2d)):
            put("conv2d", "w_0", _np(m.weight))
            if m.bias is not None:
                put("conv2d", "b_0", _np(m.bias))
            counts["conv2d"] += 1
        elif isinstance(m, tnn.Linear):
            # Paddle nn.Linear stores (in_features, out_features) — the
            # transpose of torch's layout; real exports carry Paddle's
            put("linear", "w_0", _np(m.weight).T)
            if m.bias is not None:
                put("linear", "b_0", _np(m.bias))
            counts["linear"] += 1
        else:
            # generic leaf (LayerNorm, GRU, Embedding, custom): params in
            # declaration order, then float buffers
            for _name, p in m.named_parameters(recurse=False):
                put("tensor", "t", _np(p))
                counts["tensor"] += 1
            for name, b in m.named_buffers(recurse=False):
                if "num_batches" in name:
                    continue
                put("tensor", "t", _np(b))
                counts["tensor"] += 1
    return encode_test_onnx(tensors)
