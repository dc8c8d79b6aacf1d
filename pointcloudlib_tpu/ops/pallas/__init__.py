"""Pallas TPU kernels for the sequential/hot neighbor ops."""

from pointcloudlib_tpu.ops.pallas.fps import fps_pallas

__all__ = ["fps_pallas"]
