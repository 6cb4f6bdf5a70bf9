"""Analytic distribution models (the framework's "model families"):
Gaussian mixtures used as truth distributions, Fisher-forecast inputs, and
sample generators. Re-exported from gaussian_mixtures for the package
layout; see that module for the implementations."""

from getdist_tpu.gaussian_mixtures import (
    Gaussian1D,
    Gaussian2D,
    GaussianND,
    Mixture1D,
    Mixture2D,
    MixtureND,
    RandomTestMixtureND,
    randomTestMCSamples,
)

__all__ = [
    "Gaussian1D",
    "Gaussian2D",
    "GaussianND",
    "Mixture1D",
    "Mixture2D",
    "MixtureND",
    "RandomTestMixtureND",
    "randomTestMCSamples",
]
