"""Serving: load-once predictor for image/video interpolation."""

from .predictor import Predictor

__all__ = ['Predictor']
