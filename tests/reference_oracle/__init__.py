"""Torch-side oracle reproducing the reference modules' forward math.

The reference (JimmyPang02/CVD) builds on diffusers 0.24, which is not
installed in this environment; ``diffusers_min`` re-implements the handful
of diffusers forward paths the reference modules touch, and ``modules``
reproduces the reference's own modules (motion / epi / pose-adaptor /
pose-encoder / UNet blocks) exactly, citing file:line per class.

These exist ONLY as test oracles for tests/test_reference_golden.py: they
let the Flax modules be golden-tested against the reference's real forward
semantics at random weights, closing the gap between "hand-written torch
formulas" and "the reference's module math".
"""
