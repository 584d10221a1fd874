"""Pallas TPU kernel registry.

Every Pallas escape hatch tried so far has been measured and REJECTED on
v5e (BASELINE.md): trigrid samplers (27 vs 166 Msamples/s), the fused
plane-mean+MLP decoder (frame step 62.8 vs 52.3 ms in the flagship graph,
round 4). The XLA paths win because the hot ops are gather-transaction- or
HBM-bound, where Mosaic's per-tile DMA latency dominates. The registry
stays as the plug point for future kernels.
"""

__all__: list = []
