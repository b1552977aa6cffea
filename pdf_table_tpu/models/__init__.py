"""Model zoo: per-model packages (config + flax module + pre/post processor),
mirroring the reference's package pattern (SURVEY.md §1 L2) with TPU-native
internals (NHWC, bf16, static-shape processors)."""
