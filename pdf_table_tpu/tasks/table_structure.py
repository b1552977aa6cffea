"""Table-structure-recognition task (dispatcher).

Reference: OcrTableStructureTask (model/ocr_pdf/ocr_table_structure_task.py:48)
with allowed models {CenterNet, SLANet, Lore, Lgpma, MtlTabNet, TableMaster,
LineCell, LineCellPdf}. Models join this dispatcher as their flax
implementations land; all return the common TSR schema
{"cells": [{"bbox","logic",...}]} consumed by OcrTableToHtmlTask.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from ..engine.infer_task import InferTask, TaskConfig
from ..engine.params import load_or_init
from ..models.registry import get_config, weights_dir
from ..utils.logging_utils import logger


def merge_tsr_cells(primary: Dict[str, Any], secondary: Dict[str, Any],
                    iou_thresh: float = 0.5) -> Dict[str, Any]:
    """Lore ∪ LineCell fusion (reference merge mode, ocr_system_task.py
    :604-613 + convert_table_sep_to_merge, table_common.py:1794): keep the
    secondary (line-derived, exact) cells and add primary (model) cells not
    already covered, then re-derive logical coordinates over the union."""
    from ..models.center_net.processor import assign_logical_coords
    from .table_to_html import bbox_iou

    base = [dict(c) for c in secondary.get("cells", [])]
    for c in primary.get("cells", []):
        covered = any(bbox_iou(c["bbox"], b["bbox"]) >= iou_thresh
                      for b in base)
        if not covered:
            base.append(dict(c))
    assign_logical_coords(base)
    return {"cells": base, "type": "lore_line_cell_merge"}


def _sidecar_dict(wdir: str, name_keys) -> str:
    """Find a vocab txt copied next to converted weights (see
    tools/convert_weights.py sidecar copy); '' when absent."""
    import glob

    if not os.path.isdir(wdir):
        return ""
    for p in sorted(glob.glob(os.path.join(wdir, "*.txt"))):
        base = os.path.basename(p).lower()
        if any(k in base for k in name_keys):
            return p
    return ""


class OcrTableStructureTask(InferTask):
    task_name = "table_structure"

    def __init__(self, model: str = "Lore", task_type: str = "wtw",
                 config=None, task_config: Optional[TaskConfig] = None,
                 mesh=None, **kw):
        super().__init__(task_config, mesh=mesh)
        # crop-resolution buckets for the from-pages batched path: small
        # table crops run a 384/512 program instead of the full 768/1024
        # (pure-upsampling waste otherwise). DEFAULT IS () — the exact
        # reference behavior (fixed resolution, processer_lore.py:66):
        # the converted checkpoints only ever saw small tables upscaled
        # to the full canvas, and CenterNet heads are scale-sensitive, so
        # the buckets are a throughput opt-in ("auto" or an explicit
        # tuple) pending an on-chip accuracy A/B with real weights
        # (ADVICE r3 #3). bench.py opts in.
        # wiz_rev middle stage placement: True = the dense refine + score
        # re-sort runs as its own jitted program so the whole
        # dd -> refine -> gather_logical chain stays on device (saves a
        # full tunnel RTT + host work per sub-batch); False = the round-3
        # host detour (numpy sparse refine on the ~100 KB dc download).
        # Default: PDFTABLE_WIZ_DEVICE_REFINE (1/0) when set; otherwise
        # resolved at build time to NOT utils.fault.is_axon_backend() —
        # dispatching the fused refine+gl program on the axon runtime WEDGED the
        # whole device session twice (rounds 4 and 5: first fault, then
        # every subsequent upload/download INVALID_ARGUMENT until process
        # restart), so the tunneled chip gets the host detour unless
        # explicitly opted in. The fault ladder (batch_infer_from_pages /
        # __call__) remains the backstop either way.
        env_refine = os.environ.get("PDFTABLE_WIZ_DEVICE_REFINE", "")
        self.wiz_device_refine = kw.pop(
            "wiz_device_refine",
            None if env_refine == "" else env_refine != "0")
        rb = kw.pop("res_buckets", ())
        if rb == "auto":
            self.res_buckets = (384, 512) if model in ("Lore",
                                                       "LoreAndLineCell") \
                else ()
        else:
            self.res_buckets = tuple(rb or ())
        if model == "LoreAndLineCell":
            # merge mode: LORE cells fused with OpenCV line cells
            self._merge_line_cell = True
            model = "Lore"
        else:
            self._merge_line_cell = False
        self.model_name = model
        if model == "Lore":
            from ..models.lore import LorePostProcessor, LorePreProcessor
            self.model_config = config or get_config(
                "table_structure", model, task_type=task_type, **kw)
            self.pre = LorePreProcessor(self.model_config)
            self.post = LorePostProcessor(self.model_config)
        elif model == "SLANet":
            from ..models.slanet import (SLANetPostProcessor,
                                         SLANetPreProcessor)
            self.model_config = config or get_config(
                "table_structure", model, **kw)
            if not self.model_config.dict_path:
                # a converted snapshot ships its structure dict next to the
                # weights (convert_weights copies it); prefer it over the
                # builtin token set so ids match the checkpoint
                self.model_config.dict_path = _sidecar_dict(
                    weights_dir("table_structure", model),
                    ("table_structure", "structure"))
            self.pre = SLANetPreProcessor(self.model_config)
            self.post = SLANetPostProcessor(self.model_config)
        elif model == "Lgpma":
            from ..models.lgpma import (LgpmaConfig, LgpmaPostProcessor,
                                        LgpmaPreProcessor)
            self.model_config = config or LgpmaConfig(**kw)
            self.pre = LgpmaPreProcessor(self.model_config)
            self.post = LgpmaPostProcessor(self.model_config)
        elif model in ("TableMaster", "MtlTabNet"):
            from ..models.table_master import (TableMasterConfig,
                                               TableMasterPostProcessor,
                                               TableMasterPreProcessor)
            variant = "mtl_tabnet" if model == "MtlTabNet" else "table_master"
            kw.setdefault("variant", variant)
            self.model_config = config or TableMasterConfig(**kw)
            if not self.model_config.dict_path:
                self.model_config.dict_path = _sidecar_dict(
                    weights_dir("table_structure", model),
                    ("structure_alphabet", "structure"))
            self.pre = TableMasterPreProcessor(self.model_config)
            cell_charset = None
            if self.model_config.variant == "mtl_tabnet":
                # real PubTabNet textline alphabet + master specials
                # (master_convertor convention, cell eos = len(dict)+2)
                from ..models.table_master import \
                    load_pubtabnet_textline_alphabet
                cell_charset = load_pubtabnet_textline_alphabet()
                if not self.model_config.cell_vocab_size:
                    self.model_config.cell_vocab_size = len(cell_charset) + 4
            self.post = TableMasterPostProcessor(self.model_config,
                                                 cell_charset=cell_charset)
        elif model == "CenterNet":
            from ..models.center_net import (CenterNetConfig,
                                             CenterNetPostProcessor,
                                             CenterNetPreProcessor)
            self.model_config = config or CenterNetConfig(**kw)
            self.pre = CenterNetPreProcessor(self.model_config)
            self.post = CenterNetPostProcessor(self.model_config)
        elif model in ("LineCell", "LineCellPdf"):
            self.model_config = None
            self.pre = self.post = None
        else:
            raise ImportError(f"TSR model {model!r} not yet available")

    def _build_model(self):
        if self.model_name == "Lore":
            import jax

            if self.wiz_device_refine is None:
                # lazy default (see __init__): host detour on axon. NOTE:
                # jax.default_backend() reports 'tpu' for the axon plugin,
                # so the r4 gate (!= 'axon') never fired and the wedging
                # program kept dispatching — fingerprint via is_axon_backend
                from ..utils.fault import is_axon_backend

                self.wiz_device_refine = not is_axon_backend()

            from ..models.lore import LoreModel

            cfg = self.model_config
            module = LoreModel(cfg)
            sample = np.zeros((1, cfg.resolution[0], cfg.resolution[1], 3),
                              np.float32)
            # TWO jitted programs, not one: the monolithic
            # detector+decode+processor executable trips an axon-runtime
            # re-execution bug (first exec OK, later execs
            # INVALID_ARGUMENT). features/logical each re-execute cleanly,
            # and the split costs one extra dispatch with feat staying on
            # device.
            import jax.numpy as jnp

            from ..models.lore.processor import LorePreProcessor

            mean = jnp.asarray(LorePreProcessor.MEAN)
            std = jnp.asarray(LorePreProcessor.STD)
            from ..utils.profiling import track_program
            feat_fn = track_program(
                f"tsr_feat32:{self.model_config.task_type}",
                jax.jit(lambda v, x: module.apply(
                    v, x, False, method=LoreModel.features)))
            # uint8 variant: BGR flip + normalize fused into the program so
            # the batched path uploads raw bytes (4x less tunnel H2D)
            feat_u8_fn = track_program(
                f"tsr_feat:{self.model_config.task_type}",
                jax.jit(lambda v, u: module.apply(
                    v,
                    (u.astype(jnp.float32)[..., ::-1] / 255.0 - mean) / std,
                    False, method=LoreModel.features)))
            def proc_pack(v, fo):
                # logical regressor + pack into ONE D2H array instead of
                # six: each device->host round trip costs ~40 ms of tunnel
                # latency on this rig
                logi, stacked = module.apply(v, fo["feat"], fo["dets"],
                                             method=LoreModel.logical)
                if stacked is None:
                    stacked = logi
                return jnp.concatenate(
                    [fo["dets"], fo["scores"][..., None],
                     fo["valid"].astype(jnp.float32)[..., None],
                     fo["centers"], logi, stacked], axis=-1)

            proc_fn = track_program(
                f"tsr_proc:{self.model_config.task_type}",
                jax.jit(proc_pack))

            def _norm(u):
                return (u.astype(jnp.float32)[..., ::-1] / 255.0
                        - mean) / std

            dd_fn = jax.jit(lambda v, x: module.apply(
                v, x, method=LoreModel.detect_decode))
            dd_u8_fn = track_program(
                f"tsr_dd:{self.model_config.task_type}",
                jax.jit(lambda v, u: module.apply(
                    v, _norm(u), method=LoreModel.detect_decode)))
            gl_fn = track_program(
                f"tsr_gl:{self.model_config.task_type}",
                jax.jit(lambda v, ax, cr, d, i, s: module.apply(
                    v, ax, cr, d, i, s, method=LoreModel.gather_logical)))

            def wiz_refine_sort_dev(dc):
                # device-resident middle of wiz_rev: the dense refine
                # (corner_refine.py) + score re-sort, traced INTO the
                # gather_logical program below so dd -> refine+gl chains
                # with no host round trip (the dc_packed D2H + host
                # refine cost a full tunnel RTT per sub-batch)
                from ..models.lore.corner_refine import \
                    refine_vertices_by_corners

                k = cfg.max_objs
                cells, corners = dc[:, :k], dc[:, k:]
                dets0, scores0 = cells[..., :8], cells[..., 8]
                inds0 = cells[..., 9].astype(jnp.int32)
                gb, gc = corners[..., :8], corners[..., 8:10]
                gs = corners[..., 10]
                dets0, scores0 = refine_vertices_by_corners(
                    dets0, scores0, gb, gc, gs,
                    cfg.vis_thresh, cfg.vis_thresh_corner)
                order = jnp.argsort(-scores0, axis=1)     # stable
                return (jnp.take_along_axis(dets0, order[..., None], 1),
                        jnp.take_along_axis(inds0, order, 1),
                        jnp.take_along_axis(scores0, order, 1))

            # refine + gather_logical as ONE program: a standalone
            # refine-only jit intermittently hit the runtime
            # re-execution fault (first exec OK, later execs
            # INVALID_ARGUMENT 'supplied 1 buffers but expected 2' — the
            # same family as the axon monolith bug, reproduced even on
            # XLA:CPU), while the gl program re-executes cleanly in
            # production, so the refine math rides inside it. The host
            # detour below stays as the automatic fallback (see
            # batch_infer_from_pages / apply_fn_wiz_rev).
            glrf_fn = track_program(
                f"tsr_glrf:{self.model_config.task_type}",
                jax.jit(lambda v, ax, cr, dc: module.apply(
                    v, ax, cr, *wiz_refine_sort_dev(dc),
                    method=LoreModel.gather_logical)))

            def wiz_host_refine(dc):
                # the host middle of wiz_rev: corner-anchored vertex
                # refinement on the ~100 KB packed detect-decode download
                import numpy as np

                from ..models.lore.corner_refine import \
                    refine_vertices_by_corners_np

                k = cfg.max_objs
                cells, corners = dc[:, :k], dc[:, k:]
                dets, scores = cells[..., :8], cells[..., 8]
                inds = cells[..., 9].astype(np.int32)
                gboxes, gcenters = corners[..., :8], corners[..., 8:10]
                gscores = corners[..., 10]
                dets, scores = refine_vertices_by_corners_np(
                    dets, scores, gboxes, gcenters, gscores,
                    cfg.vis_thresh, cfg.vis_thresh_corner)
                order = np.argsort(-scores, axis=1, kind="stable")
                dets = np.take_along_axis(dets, order[..., None], axis=1)
                scores = np.take_along_axis(scores, order, axis=1)
                inds = np.take_along_axis(inds, order, axis=1)
                return dets, inds, scores

            # exposed for the batched page path, which pipelines the two
            # device programs across sub-batches (all detect-decodes
            # enqueue before the first host refine blocks)
            self._wiz_parts = {"dd": dd_fn, "dd_u8": dd_u8_fn,
                               "gl": gl_fn, "refine": wiz_host_refine,
                               "glrf": glrf_fn}
            # raw (un-jitted) entry points for the batched page path's
            # warp-fused programs: crop warp + normalize + trunk in ONE
            # dispatch per sub-batch (per-call overhead is first-order on
            # the tunneled rig — docs/performance.md round 4)
            self._lore_raw = {
                "features": lambda v, x: module.apply(
                    v, x, False, method=LoreModel.features),
                "detect_decode": lambda v, x: module.apply(
                    v, x, method=LoreModel.detect_decode),
                "proc_pack": proc_fn,
            }

            def apply_fn_wiz_rev(variables, batch):
                # wiz_rev runs the corner refine on HOST between two device
                # programs: the in-program refine trips an axon-runtime
                # re-execution bug (first exec OK, later INVALID_ARGUMENT);
                # its operands are ~100 KB so host math costs nothing and
                # the big ax/cr maps never leave the device. Programs route
                # through self._wiz_parts (not the closure vars) so the
                # batched path and tests see ONE source of truth.
                import numpy as np

                wp = self._wiz_parts
                if "image_u8" in batch:
                    dd = wp["dd_u8"](variables, batch["image_u8"])
                else:
                    dd = wp["dd"](variables, batch["image"])
                if self.wiz_device_refine:
                    # zero-RTT chain: dd -> refine+gather_logical, all on
                    # device; runtime re-exec fault falls back to host
                    # (deferred faults surface later, at the blocking
                    # download in _postprocess — __call__ owns those)
                    try:
                        return {"packed": wp["glrf"](
                            variables, dd["ax_flat"], dd["cr_map"],
                            dd["dc_packed"])}
                    except Exception:
                        self._disable_device_refine()
                dc = np.asarray(dd["dc_packed"])       # ONE tunnel trip
                dets, inds, scores = wp["refine"](dc)
                packed = wp["gl"](variables, dd["ax_flat"], dd["cr_map"],
                                  jnp.asarray(dets), jnp.asarray(inds),
                                  jnp.asarray(scores))
                return {"packed": packed}

            def apply_fn(variables, batch):
                if cfg.wiz_rev:
                    return apply_fn_wiz_rev(variables, batch)
                if "image_u8" in batch:
                    fo = feat_u8_fn(variables, batch["image_u8"])
                else:
                    fo = feat_fn(variables, batch["image"])
                return {"packed": proc_fn(variables, fo)}

            self._presplit_run = True
            task_type = getattr(cfg, "task_type", "")
            variables = load_or_init(
                module, sample,
                weights_dir("table_structure", self.model_name, task_type))
            return apply_fn, variables
        elif self.model_name == "SLANet":
            from ..models.slanet import SLANet

            cfg = self.model_config
            module = SLANet(cfg)
            sample = np.zeros((1, cfg.table_max_len, cfg.table_max_len, 3),
                              np.float32)
        elif self.model_name == "CenterNet":
            from ..models.center_net import CycleCenterNet

            cfg = self.model_config
            module = CycleCenterNet(cfg)
            sample = np.zeros((1, cfg.resolution[0], cfg.resolution[1], 3),
                              np.float32)
        elif self.model_name in ("TableMaster", "MtlTabNet"):
            from ..models.table_master import TableMaster

            cfg = self.model_config
            module = TableMaster(cfg)
            sample = np.zeros((1, cfg.img_size[0], cfg.img_size[1], 3),
                              np.float32)
        elif self.model_name == "Lgpma":
            from ..models.lgpma import LGPMA

            cfg = self.model_config
            module = LGPMA(cfg)
            sample = np.zeros((1, 64, 64, 3), np.float32)
        else:
            return (lambda v, b: b), None
        task_type = getattr(cfg, "task_type", "")
        variables = load_or_init(
            module, sample,
            weights_dir("table_structure", self.model_name, task_type))

        def apply_fn(variables, batch):
            return module.apply(variables, batch["image"], train=False)

        return apply_fn, variables

    def _disable_device_refine(self) -> None:
        """Permanent per-task fallback to the host wiz_rev detour after a
        runtime re-execution fault on the fused refine+gather_logical
        program (intermittent 'Execution supplied N buffers' fault — see
        the _build_model note)."""
        if self.wiz_device_refine:
            logger.warning(
                "[table_structure] device wiz refine hit a runtime "
                "re-execution fault — falling back to the host refine "
                "detour for this task")
        self.wiz_device_refine = False

    def _preprocess(self, inputs, **kw):
        if self.model_name == "LineCell":
            from ..models.line_cell import extract_cells_from_image
            return {"host_result": extract_cells_from_image(inputs)}, {}
        out = self.pre(inputs)
        meta = out.pop("meta", None) or {"shape_list": out.pop("shape_list",
                                                               None)}
        if self._merge_line_cell:
            from ..models.line_cell import extract_cells_from_image
            meta["line_cells"] = extract_cells_from_image(inputs)
        return out, meta

    # packed LORE output layout (see pack() in _build_model)
    _LORE_PACK = (("dets", 8), ("scores", 1), ("valid", 1),
                  ("centers", 2), ("logi", 4), ("stacked_logi", 4))

    @classmethod
    def _unpack_lore(cls, arr):
        import numpy as np
        out, o = {}, 0
        for k, n in cls._LORE_PACK:
            sl = arr[..., o:o + n]
            o += n
            out[k] = sl[..., 0] if n == 1 else sl
        out["valid"] = out["valid"] > 0.5
        return out

    def _run_model(self, batch):
        if "host_result" in batch:
            return batch["host_result"]
        self.ensure_built()   # _presplit_run is set by _build_model
        if getattr(self, "_presplit_run", False):
            # apply_fn already dispatches its own jitted programs; wrapping
            # it in another jit would fuse them back into the monolithic
            # executable (see _build_model note)
            self.ensure_built()
            return self._apply_fn(self._params, batch)
        return super()._run_model(batch)

    def _postprocess(self, raw, meta):
        if self.model_name == "LineCell":
            return raw
        if "packed" in raw:
            import numpy as np
            raw = self._unpack_lore(np.asarray(raw["packed"]))
        if self.model_name == "SLANet":
            return self.post(raw, meta["shape_list"])
        result = self.post(raw, meta)
        if self._merge_line_cell and meta.get("line_cells"):
            result = merge_tsr_cells(result, meta["line_cells"])
        return result

    def __call__(self, inputs, **kwargs):
        """Serial single-crop path with deferred-fault containment: a
        runtime re-execution fault on the fused refine+gather_logical
        program surfaces at the blocking download inside
        ``_postprocess`` (np.asarray of the packed handle), OUTSIDE the
        dispatch-time try in apply_fn_wiz_rev — catch it here, fall back
        to the host refine detour, and re-run the crop."""
        from ..utils.fault import is_device_fault

        try:
            return super().__call__(inputs, **kwargs)
        except Exception as e:
            if (self.model_name == "Lore"
                    and getattr(self, "wiz_device_refine", False)
                    and is_device_fault(e)):
                self._disable_device_refine()
                return super().__call__(inputs, **kwargs)
            raise

    def batch_infer_from_pages(self, pages_dev, regions) -> list:
        """LORE crops sampled straight from the device-resident page stack:
        ``regions`` is [(page_idx, (x1, y1, x2, y2))] in page coords. The
        corner-anchored affine warp (LorePreProcessor semantics) runs as a
        jitted gather program per sub-batch — no host warp, no crop upload.
        Falls back to host crops for non-Lore models.

        Fault ladder (VERDICT r4 #1): JAX faults are *deferred* — they
        raise at the blocking fetch_concat downloads, not at dispatch —
        so the whole device section retries as a unit: (a) fused device
        refine, (b) host-refine detour after _disable_device_refine,
        (c) full host-crop fallback via :meth:`batch_infer`. Only
        non-device exceptions (code bugs) propagate immediately.
        The reference's contract is that a batch never dies mid-run
        (cli/main.py:142-144)."""
        if not regions:
            return []
        if self.model_name != "Lore":
            pages_np = np.asarray(pages_dev)
            crops = []
            for pi, (x1, y1, x2, y2) in regions:
                crops.append(pages_np[pi][int(y1):int(y2), int(x1):int(x2)])
            return self.batch_infer(crops)

        from ..utils.fault import is_device_fault

        try:
            return self._lore_infer_from_pages(pages_dev, regions)
        except Exception as e:
            if not is_device_fault(e):
                raise
            if self.wiz_device_refine:
                # deferred fault out of the fused refine+gl program:
                # switch this task to the host-refine detour and re-run
                # the SAME chunk (pages already in flight must not become
                # error outputs — VERDICT r4 weak #3)
                self._disable_device_refine()
                try:
                    return self._lore_infer_from_pages(pages_dev, regions)
                except Exception as e2:
                    if not is_device_fault(e2):
                        raise
                    e = e2
            logger.warning(
                "[table_structure] batched device path hit a runtime "
                "fault (%s: %s) — re-running the chunk via host crops",
                type(e).__name__, e)
            # last rung: host crops through batch_infer (fresh programs,
            # per-crop warp on host). If even this faults the exception
            # propagates to the runner's chunk containment.
            pages_np = np.asarray(pages_dev)
            crops = [pages_np[pi][int(y1):int(y2), int(x1):int(x2)]
                     for pi, (x1, y1, x2, y2) in regions]
            return self.batch_infer(crops)

    def _lore_infer_from_pages(self, pages_dev, regions) -> list:
        import time

        import jax
        import jax.numpy as jnp

        from ..engine.infer_task import bucket_batch_size
        from ..models.lore.processor import LorePreProcessor
        from ..ops.warp import resample_axis_aligned_crops
        from ..utils.profiling import trace_acc

        t_prep0 = time.perf_counter()
        self.ensure_built()
        cfg = self.model_config
        inp_h, inp_w = cfg.resolution
        mean = jnp.asarray(LorePreProcessor.MEAN)
        std = jnp.asarray(LorePreProcessor.STD)

        mats, pidx, metas = [], [], []
        valid_w, valid_h, res_hw = [], [], []
        pages_np_local = None   # call-local (lanes may run 2 chunks
        # concurrently; a cache on self raced between workers)
        for pi, (x1, y1, x2, y2) in regions:
            h, w = float(y2 - y1), float(x2 - x1)
            s = max(h, w, 1.0)
            # crop-resolution bucket: a small table warped to the full
            # model resolution is pure upsampling waste; pick the smallest
            # bucket that holds the crop at native scale (r3 perf item —
            # the reference always warps to the fixed 768/1024,
            # processer_lore.py:66-131). res_buckets=() restores that.
            ri_h, ri_w = inp_h, inp_w
            for rb in self.res_buckets:
                if s <= rb and rb < max(inp_h, inp_w):
                    ri_h = ri_w = rb
                    break
            res_hw.append((ri_h, ri_w))
            # valid dst extent: the crop content maps to (w, h) * inp/s;
            # the rest is black border like the reference's crop-then-warp
            valid_w.append(min(int(np.ceil(w * ri_w / s)), ri_w))
            valid_h.append(min(int(np.ceil(h * ri_h / s)), ri_h))
            # the LORE src region is always an axis-aligned square (the
            # crop's bbox padded to s x s) -> row-gather + MXU resample
            # instead of the per-pixel gather warp
            if cfg.upper_left:
                box = np.array([x1, y1, x1 + s, y1 + s], np.float32)
                c = np.array([0.0, 0.0], np.float32)
            else:
                cx, cy = x1 + w / 2.0, y1 + h / 2.0
                box = np.array([cx - s / 2, cy - s / 2,
                                cx + s / 2, cy + s / 2], np.float32)
                c = np.array([w / 2.0, h / 2.0], np.float32)
            mats.append(box)
            pidx.append(pi)
            meta = {"c": c, "s": s, "org_shape": (int(h), int(w)),
                    "out_h": ri_h // cfg.down_ratio,
                    "out_w": ri_w // cfg.down_ratio}
            if self._merge_line_cell:
                # merge mode needs the OpenCV line cells from the host crop
                from ..models.line_cell import extract_cells_from_image
                if pages_np_local is None:
                    pages_np_local = np.asarray(pages_dev)
                pg = pages_np_local[pi]
                meta["line_cells"] = extract_cells_from_image(
                    pg[int(y1):int(y2), int(x1):int(x2)])
            metas.append(meta)

        trace_acc("tsr_prep_host", time.perf_counter() - t_prep0)
        wiz = getattr(self, "_wiz_parts", None) \
            if getattr(cfg, "wiz_rev", False) else None

        def get_fused_fn(res):
            """Crop warp + normalize + LORE trunk in ONE program per
            sub-batch (wiz: through detect_decode; else: through
            features). The separate warp program cost one extra dispatch
            + an HBM round trip of the f32 crop stack per sub-batch."""
            key = ("lore_fused", pages_dev.shape, res, wiz is not None)
            fn = self._jitted.get(key)
            if fn is None:
                raw = self._lore_raw[
                    "detect_decode" if wiz is not None else "features"]

                def run(v, pages, m, pxi, vw, vh):
                    crops = resample_axis_aligned_crops(
                        pages, pxi, m, res,
                        valid_w=vw, valid_h=vh)         # f32 RGB 0..255
                    x = (crops[..., ::-1] / 255.0 - mean) / std
                    return raw(v, x)

                from ..utils.profiling import track_program
                fn = track_program(f"tsr_fused:{res}", jax.jit(run))
                self._jitted[key] = fn
            return fn

        # dispatch per resolution bucket, sub-batched under the HBM cap
        # (the cap scales with the bucket's pixel ratio: a 384^2 crop is
        # 1/4 the activation memory of 768^2, and fewer program calls mean
        # fewer tunnel round trips); every sub-batch enqueues before any
        # download blocks
        base_cap = max(1, self.config.batch_size)
        full_px = float(inp_h * inp_w)
        by_res: Dict[tuple, list] = {}
        for i, r in enumerate(res_hw):
            by_res.setdefault(r, []).append(i)
        sub_batches = []
        t_disp0 = time.perf_counter()
        for res, idx_list in sorted(by_res.items()):
            cap = max(1, int(base_cap * full_px / (res[0] * res[1])))
            fused_fn = get_fused_fn(res)
            for s0 in range(0, len(idx_list), cap):
                sub = idx_list[s0:s0 + cap]
                nb = bucket_batch_size(len(sub))
                pad = nb - len(sub)
                m = np.stack([mats[i] for i in sub]
                             + [np.array([0, 0, 1, 1], np.float32)] * pad)
                px = np.asarray([pidx[i] for i in sub] + [0] * pad,
                                np.int32)
                vw = np.asarray([valid_w[i] for i in sub] + [1] * pad,
                                np.int32)
                vh = np.asarray([valid_h[i] for i in sub] + [1] * pad,
                                np.int32)
                out = fused_fn(self._params, pages_dev, jnp.asarray(m),
                               jnp.asarray(px), jnp.asarray(vw),
                               jnp.asarray(vh))
                sub_batches.append((sub, out))
        trace_acc("tsr_dispatch", time.perf_counter() - t_disp0)

        import os as _os
        fetch_parts = _os.environ.get("PDFTABLE_FETCH_PARTS", "0") != "0"

        def start_d2h(handle):
            """Issue the downlink at DISPATCH time (parts mode): the
            transfer streams while later sub-batches and other lanes'
            programs still compute, so the blocking read in fetch_concat
            becomes a ~1 ms local hit (measured: tools/exp.py exp_rtt)."""
            if fetch_parts:
                try:
                    handle.copy_to_host_async()
                except Exception:
                    pass
            return handle

        def fetch_concat(handles):
            """Blocking download for a list of (nb_i, ...) device arrays
            (equal trailing dims). concat mode: ONE device-side concat +
            one download (every blocking np.asarray pays a full tunnel
            RTT, ~30-38 ms measured round 4, regardless of size). parts
            mode: each handle's transfer was issued at dispatch via
            start_d2h, so per-part reads drain already-landed buffers
            without the concat's all-parts barrier."""
            t_f0 = time.perf_counter()
            if fetch_parts:
                for h in handles:   # no-op if already issued at dispatch
                    try:
                        h.copy_to_host_async()
                    except Exception:
                        pass
                parts = [np.asarray(h) for h in handles]
                trace_acc("tsr_fetch_block", time.perf_counter() - t_f0)
                return parts
            if len(handles) == 1:
                out = handles[0]
            else:
                out = jnp.concatenate(handles, axis=0)
            try:
                out.copy_to_host_async()
            except Exception:
                pass
            arr = np.asarray(out)
            parts, off = [], 0
            for h in handles:
                parts.append(arr[off:off + h.shape[0]])
                off += h.shape[0]
            trace_acc("tsr_fetch_block", time.perf_counter() - t_f0)
            return parts

        pending = []
        t_g0 = time.perf_counter()
        if wiz is not None and self.wiz_device_refine:
            # zero-RTT wiz_rev: refine+sort is traced into the
            # gather_logical program, so nothing blocks between
            # detect-decode and the final packed concat below. A runtime
            # re-execution fault (see _build_model note) falls back to
            # the host detour permanently for this task.
            try:
                for sub, dd in sub_batches:
                    pending.append((sub, start_d2h(wiz["glrf"](
                        self._params, dd["ax_flat"], dd["cr_map"],
                        dd["dc_packed"]))))
            except Exception:
                self._disable_device_refine()
                pending = []
        if wiz is not None and not pending:
            # host-refine fallback, pipelined across sub-batches: ALL
            # detect-decode programs enqueue before any refine blocks, and
            # their dc_packed tensors download as ONE concat (single RTT)
            dc_parts = fetch_concat([dd["dc_packed"]
                                     for _sub, dd in sub_batches])
            for (sub, dd), dc in zip(sub_batches, dc_parts):
                dets, inds, scores = wiz["refine"](dc)
                packed = wiz["gl"](self._params, dd["ax_flat"],
                                   dd["cr_map"], jnp.asarray(dets),
                                   jnp.asarray(inds), jnp.asarray(scores))
                pending.append((sub, start_d2h(packed)))
        elif wiz is None:
            for sub, fo in sub_batches:
                pending.append((sub, start_d2h(self._lore_raw["proc_pack"](
                    self._params, fo))))
        trace_acc("tsr_refine_dispatch", time.perf_counter() - t_g0)
        results: list = [None] * len(metas)
        packed_parts = fetch_concat([p for _sub, p in pending])
        t_p0 = time.perf_counter()
        for (sub, _h), packed_np in zip(pending, packed_parts):
            for j, i in enumerate(sub):
                results[i] = self._postprocess(
                    {"packed": packed_np[j:j + 1]}, metas[i])
        trace_acc("tsr_postproc", time.perf_counter() - t_p0)
        return results

    def batch_infer(self, crops) -> list:
        """All table crops of a page in ONE device forward (the reference
        loops per crop, ocr_system_task.py:192-198). Fixed model resolution
        makes the stack static-shape; host pre/post stay per crop."""
        if not crops:
            return []
        if self.model_name in ("LineCell",):
            return [self(c) for c in crops]
        import numpy as np

        from ..engine.infer_task import bucket_batch_size

        if self.model_name == "Lore":
            # uint8 upload + on-device BGR flip/normalize: 4x less tunnel
            # H2D and 4x less host concat than stacking f32 warps
            prepped = [self.pre.warp_u8(c) for c in crops]
            pres = [{"image_u8": p["image_u8"]} for p in prepped]
            metas = [p["meta"] for p in prepped]
            stack_key = "image_u8"
        else:
            prepped = [self._preprocess(c) for c in crops]
            pres = [p[0] for p in prepped]
            metas = [p[1] for p in prepped]
            stack_key = "image"
        self.ensure_built()
        # pad each crop batch up to a bucket size (pages carry varying table
        # counts; without padding every new count would recompile) and cap
        # the device batch so TSR never monopolizes HBM while det/rec/layout
        # programs hold their own buffers
        cap = max(1, self.config.batch_size)
        # dispatch every sub-batch before blocking on any download, so
        # sub-batch k's D2H overlaps k+1's device compute
        handles = []
        for s in range(0, len(pres), cap):
            chunk = pres[s:s + cap]
            batch = {stack_key: np.concatenate(
                [p[stack_key] for p in chunk], axis=0)}
            batch, _ = self.pad_batch(batch,
                                      bucket_batch_size(len(chunk)))
            handles.append(self._run_model(batch))
        results = []
        for h, raw in enumerate(handles):
            raw_np = {k: np.asarray(v) for k, v in raw.items()
                      if hasattr(v, "shape")
                      and getattr(v, "ndim", 0) >= 1}
            for i, meta in enumerate(metas[h * cap:(h + 1) * cap]):
                one = {k: v[i:i + 1] for k, v in raw_np.items()}
                results.append(self._postprocess(one, meta))
        return results
