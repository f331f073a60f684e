"""Thin cog (Replicate) adapter over serving.predictor.Predictor.

Deployable-container parity with the reference's predict.py:15-88 +
cog.yaml (google-research/frame-interpolation): the reference ships a
GPU/TF2 cog recipe; this one serves the TPU-native framework. All logic
lives in the cog-free `Predictor` (predictor.py) — this module only maps
cog's typed IO onto it, so it imports ONLY when cog is installed (inside
the container `cog build` produces from serving/cog.yaml).

Model path and serving knobs come from env vars so one image serves any
bundle:
  FI_MODEL_PATH    (default /src/pretrained_models/film_net_style)
  FI_DTYPE_POLICY  (default bfloat16 — the measured-safe serving policy)
  FI_WARP_IMPL     (default auto)
"""
from __future__ import annotations

import os
from pathlib import Path

from cog import BasePredictor, Input  # requires the cog runtime

from .predictor import Predictor


class CogPredictor(BasePredictor):
  """cog entry point (serving/cog.yaml: `predict:` points here)."""

  def setup(self) -> None:
    self._predictor = Predictor(
        os.environ.get('FI_MODEL_PATH',
                       '/src/pretrained_models/film_net_style'),
        dtype_policy=os.environ.get('FI_DTYPE_POLICY', 'bfloat16'),
        warp_impl=os.environ.get('FI_WARP_IMPL', 'auto'))
    self._predictor.setup()

  def predict(
      self,
      frame1: Path = Input(description='The first input frame'),
      frame2: Path = Input(description='The second input frame'),
      times_to_interpolate: int = Input(
          default=1, ge=1, le=8,
          description='1 returns the t=0.5 mid-frame PNG; >1 returns a '
                      '30-fps video with 2^times_to_interpolate + 1 '
                      'frames.'),
  ) -> Path:
    return Path(self._predictor.predict(
        str(frame1), str(frame2),
        times_to_interpolate=int(times_to_interpolate)))
