"""Execution backends: fused XLA (jit) and fused Pallas TPU kernels.

The reference's backends are DaCe SDFG expansions per vendor
(/root/reference/stencilflow/stencil/{intel_fpga,xilinx,cpu}.py); ours are
lowering strategies over the same typed IR: ``xla`` (whole-domain jit, the
verification backend and fallback), ``pallas`` (single fused overlapped-tile
kernel, the performance backend), with multi-chip execution layered in
``stencilflow_tpu.parallel``.
"""
from .xla import chain_halo, compile_chain, run_chain

__all__ = ["chain_halo", "compile_chain", "run_chain"]
