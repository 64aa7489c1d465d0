"""Compute ops: pure-JAX reference implementations + Pallas TPU kernels.

Every op has an XLA-composable reference path (used for tests and as a
fallback on CPU) and, where performance-critical, a Pallas kernel selected
at runtime. The split mirrors the reference engine's kernel layer
(reference src/kernel/avx2.rs, src/moe.rs) re-designed for the MXU/VPU.
"""
