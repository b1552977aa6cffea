"""Best-effort ONNX -> flax conversion by ordered shape matching.

Paddle-exported ONNX graphs carry auto-generated initializer names
(conv2d_123.w_0 ...), so name maps don't transfer. But Paddle exports keep
initializers in graph (execution) order; flax trees flatten in
alphabetical DFS order, which for this zoo's systematic layer naming
(b0.., stage0.., layer1_0..) tracks forward order — matching by
(order, shape) converts sequential CNNs reliably. Every assignment is shape-verified and reported;
ambiguous leftovers are listed for manual mapping.

Use: load initializers (convert.onnx_reader), filter the tensor kinds, then
``match_by_shape(onnx_tensors, flax_params)``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from .torch_to_flax import ConversionReport, convert_conv, convert_dense


def flatten_params(tree: Dict[str, Any], prefix: str = ""
                   ) -> List[Tuple[str, np.ndarray]]:
    """Deterministic depth-first flattening (declaration order is preserved
    by dict insertion order in flax param trees)."""
    out: List[Tuple[str, np.ndarray]] = []
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(flatten_params(v, path))
        else:
            out.append((path, np.asarray(v)))
    return out


def _onnx_to_flax_shapes(arr: np.ndarray) -> List[Tuple[Tuple[int, ...],
                                                        np.ndarray]]:
    """Candidate flax-layout views of an ONNX tensor."""
    cands = [(tuple(arr.shape), arr)]
    if arr.ndim == 4:                      # conv OIHW -> HWIO
        cands.append((tuple(convert_conv(arr).shape), convert_conv(arr)))
        # depthwise paddle layout (O, 1, H, W) -> (H, W, 1, O)
        if arr.shape[1] == 1:
            dw = np.transpose(arr, (2, 3, 1, 0))
            cands.append((tuple(dw.shape), dw))
    if arr.ndim == 2:                      # linear (O, I) -> (I, O)
        cands.append((tuple(convert_dense(arr).shape), convert_dense(arr)))
    return cands


def match_by_shape(onnx_tensors: Dict[str, np.ndarray],
                   params: Dict[str, Any]) -> ConversionReport:
    """Mutates ``params`` leaves in place by ordered shape matching."""
    rep = ConversionReport()
    flat = flatten_params(params)
    used = [False] * len(flat)
    cursor = 0
    for name, arr in onnx_tensors.items():
        if arr.ndim == 0 or arr.size == 0:
            continue
        cands = _onnx_to_flax_shapes(arr)
        placed = False
        # scan forward from the cursor first (order prior), then anywhere
        order = list(range(cursor, len(flat))) + list(range(0, cursor))
        for idx in order:
            if used[idx]:
                continue
            ppath, pval = flat[idx]
            for shape, view in cands:
                if tuple(pval.shape) == shape:
                    node = params
                    parts = ppath.split("/")
                    for p in parts[:-1]:
                        node = node[p]
                    node[parts[-1]] = view.astype(pval.dtype)
                    used[idx] = True
                    rep.record(name, ppath, shape)
                    cursor = idx + 1
                    placed = True
                    break
            if placed:
                break
        if not placed:
            rep.missing.append(name)
    return rep
