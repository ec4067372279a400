"""Iterative graph kernels re-expressed as DataFrame superstep programs."""
