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

__all__ = ["__version__"]
