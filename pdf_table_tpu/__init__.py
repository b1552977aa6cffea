"""pdf_table_tpu — a TPU-native document-understanding / table-extraction framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
PdfTable toolkit (CycloneBoy/pdf_table): PDF/image -> text detection ->
text recognition -> layout analysis -> table structure recognition -> HTML.

Compute path: flax modules + jit-compiled stage programs with bucketed static
shapes, Pallas kernels for hot preprocessing (resize/normalize, perspective
crop) and deformable convolution, and `jax.sharding.Mesh` data parallelism
over page/crop batches.  Host path: a native C++ PDF reader (pdfio), HTML
assembly, and classical OpenCV-lineage extraction.
"""

from .version import __version__

__all__ = ["__version__", "read_pdf", "OcrSystemTask", "OcrSystemConfig",
           "BatchPipeline", "ExtractionService"]


def __getattr__(name):
    """Lazy re-exports of the public API surfaces (reference
    src/pdftable/__init__.py:14-19 re-exports entity/utils/model/process)."""
    if name == "read_pdf":
        from .pdf_table import read_pdf
        return read_pdf
    if name in ("OcrSystemTask", "OcrSystemConfig"):
        from . import pipeline
        return getattr(pipeline, name)
    if name == "BatchPipeline":
        from .pipeline.batch_runner import BatchPipeline
        return BatchPipeline
    if name == "ExtractionService":
        from .serve import ExtractionService
        return ExtractionService
    if name in ("entity", "utils", "models", "tasks", "pipeline",
                "pdf_table", "ops", "eval", "data", "train", "convert",
                "pdfio", "parallel"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
