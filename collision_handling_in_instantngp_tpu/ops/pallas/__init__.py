"""Pallas TPU kernels for the hot path. Every kernel has a pure-JAX oracle in
ops/ that the tests verify against (SURVEY.md §7 step 4)."""
