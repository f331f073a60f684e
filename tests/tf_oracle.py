"""TF-side oracle used to test full-model parity and the weight importer.

This is an independent tf.Module implementation of the FILM forward pass,
built from the structural description in SURVEY.md §2a, with variable names
and checkpoint attribute paths arranged to match what the reference's Keras
model produces (google-research/frame-interpolation models/film_net/*). The
tests save it as a SavedModel / TF checkpoint and verify that
frame_interpolation_tpu.io.tf_import maps its weights onto the flax model
bit-for-bit and that both forwards agree numerically.

Variable name layout emulated (as in released SavedModels):
  feat_net/sub_extractor/cfeat_conv_{k}/{kernel,bias}
  predict_flow/flow_predictor_{i}/conv_{j}/{kernel,bias}
  predict_flow/flow_predictor_shared/conv_{j}/{kernel,bias}
  fusion/conv2d[_N]/{kernel,bias}     (auto-named, creation order)
  fusion/conv2d_N/{kernel,bias}

Checkpoint attribute-path layout emulated (tf.train.Checkpoint(model=...)):
  model/layer_with_weights-0/extract_sublevels/convs/{k}/...
  model/layer_with_weights-1/_predictors/{i}/_convs/{j}/...
  model/layer_with_weights-2/convs/{i}/{slot}/... and .../output_conv/...
"""
from __future__ import annotations

import numpy as np
import tensorflow as tf

from frame_interpolation_tpu.options import Options


def tf_dense_image_warp_backward(image: tf.Tensor,
                                 flow_xy: tf.Tensor) -> tf.Tensor:
  """Backward warp with tfa.dense_image_warp's bilinear boundary rule.

  out[b, y, x] = bilinear(image[b], y + flow_xy[...,1], x + flow_xy[...,0]);
  floors are clamped into [0, size-2], alphas into [0, 1].
  """
  shape = tf.shape(image)
  b, h, w = shape[0], shape[1], shape[2]
  gy, gx = tf.meshgrid(tf.range(h), tf.range(w), indexing='ij')
  qy = tf.cast(gy[None], tf.float32) + flow_xy[..., 1]
  qx = tf.cast(gx[None], tf.float32) + flow_xy[..., 0]
  fy = tf.clip_by_value(tf.floor(qy), 0.0, tf.cast(h - 2, tf.float32))
  fx = tf.clip_by_value(tf.floor(qx), 0.0, tf.cast(w - 2, tf.float32))
  ay = tf.clip_by_value(qy - fy, 0.0, 1.0)[..., None]
  ax = tf.clip_by_value(qx - fx, 0.0, 1.0)[..., None]
  iy = tf.cast(fy, tf.int32)
  ix = tf.cast(fx, tf.int32)

  def gather(dy, dx):
    idx = tf.stack([iy + dy, ix + dx], axis=-1)
    return tf.gather_nd(image, idx, batch_dims=1)

  tl, tr = gather(0, 0), gather(0, 1)
  bl, br = gather(1, 0), gather(1, 1)
  top = tl + (tr - tl) * ax
  bot = bl + (br - bl) * ax
  return top + (bot - top) * ay


def _leaky(x):
  return tf.nn.leaky_relu(x, alpha=0.2)


class _Conv(tf.Module):
  """Conv2D equivalent: explicit variables so we control names exactly."""

  def __init__(self, k_size, cin, cout, var_scope, activation=_leaky,
               seed=0):
    super().__init__()
    rng = np.random.RandomState(seed)
    limit = np.sqrt(6.0 / (k_size * k_size * cin + k_size * k_size * cout))
    kernel0 = rng.uniform(-limit, limit,
                          (k_size, k_size, cin, cout)).astype(np.float32)
    bias0 = rng.uniform(-0.05, 0.05, (cout,)).astype(np.float32)
    self.kernel = tf.Variable(kernel0, name=f'{var_scope}/kernel')
    self.bias = tf.Variable(bias0, name=f'{var_scope}/bias')
    self._activation = activation

  def __call__(self, x):
    y = tf.nn.conv2d(x, self.kernel, strides=1, padding='SAME')
    y = tf.nn.bias_add(y, self.bias)
    if self._activation is not None:
      y = self._activation(y)
    return y


def _avg_pool(x):
  return tf.nn.avg_pool2d(x, ksize=2, strides=2, padding='VALID')


class _SubTree(tf.Module):

  def __init__(self, opts: Options, seed=0):
    super().__init__()
    k, n = opts.filters, opts.sub_levels
    convs = []
    cin = 3
    for i in range(n):
      cout = k << i
      convs.append(_Conv(3, cin, cout,
                         f'feat_net/sub_extractor/cfeat_conv_{2 * i}',
                         seed=seed + 2 * i))
      convs.append(_Conv(3, cout, cout,
                         f'feat_net/sub_extractor/cfeat_conv_{2 * i + 1}',
                         seed=seed + 2 * i + 1))
      cin = cout
    self.convs = convs

  def __call__(self, image, n):
    head = image
    pyramid = []
    for i in range(n):
      head = self.convs[2 * i](head)
      head = self.convs[2 * i + 1](head)
      pyramid.append(head)
      if i < n - 1:
        head = _avg_pool(head)
    return pyramid


class _FeatNet(tf.Module):

  def __init__(self, opts: Options, seed=0):
    super().__init__()
    self.extract_sublevels = _SubTree(opts, seed=seed)
    self._opts = opts

  def __call__(self, image_pyramid):
    opts = self._opts
    sub_pyramids = [
        self.extract_sublevels(image_pyramid[i],
                               min(len(image_pyramid) - i, opts.sub_levels))
        for i in range(len(image_pyramid))
    ]
    out = []
    for i in range(len(image_pyramid)):
      feats = sub_pyramids[i][0]
      for j in range(1, opts.sub_levels):
        if j <= i:
          feats = tf.concat([feats, sub_pyramids[i - j][j]], axis=-1)
      out.append(feats)
    return out


class _FlowEstimator(tf.Module):

  def __init__(self, name, num_convs, num_filters, cin, seed=0):
    super().__init__()
    convs = []
    for j in range(num_convs):
      convs.append(_Conv(3, cin, num_filters,
                         f'predict_flow/{name}/conv_{j}', seed=seed + j))
      cin = num_filters
    convs.append(_Conv(1, cin, num_filters // 2,
                       f'predict_flow/{name}/conv_{num_convs}',
                       seed=seed + num_convs))
    convs.append(_Conv(1, num_filters // 2, 2,
                       f'predict_flow/{name}/conv_{num_convs + 1}',
                       activation=None, seed=seed + num_convs + 1))
    self._convs = convs

  def __call__(self, a, b):
    net = tf.concat([a, b], axis=-1)
    for conv in self._convs:
      net = conv(net)
    return net


class _PredictFlow(tf.Module):

  def __init__(self, opts: Options, seed=0):
    super().__init__()
    preds = []
    for i in range(opts.specialized_levels):
      cin = 2 * opts.feature_channels(i)
      preds.append(_FlowEstimator(f'flow_predictor_{i}', opts.flow_convs[i],
                                  opts.flow_filters[i], cin, seed=seed + 10 * i))
    shared_cin = 2 * opts.feature_channels(opts.specialized_levels)
    shared = _FlowEstimator('flow_predictor_shared', opts.flow_convs[-1],
                            opts.flow_filters[-1], shared_cin,
                            seed=seed + 1000)
    preds.append(shared)
    # Mimic the reference: the shared predictor object is repeated for every
    # coarse level in the tracked list.
    for _ in range(opts.specialized_levels + 1, opts.pyramid_levels):
      preds.append(shared)
    self._predictors = preds

  def __call__(self, pa, pb):
    levels = len(pa)
    v = self._predictors[-1](pa[-1], pb[-1])
    residuals = [v]
    for i in reversed(range(levels - 1)):
      size = tf.shape(pa[i])[1:3]
      v = tf.image.resize(2 * v, size)
      warped = tf_dense_image_warp_backward(pb[i], v)
      v_residual = self._predictors[i](pa[i], warped)
      residuals.append(v_residual)
      v = v_residual + v
    return list(reversed(residuals))


class _Fusion(tf.Module):

  def __init__(self, opts: Options, seed=0):
    super().__init__()
    m, k = opts.specialized_levels, opts.filters
    levels = opts.fusion_pyramid_levels

    def aligned_channels(level):
      # 2*(3 + feat) + 2 + 2 per SURVEY.md §2a channel arithmetic.
      return 2 * (3 + opts.feature_channels(level)) + 4

    self.convs = []
    counter = [0]

    def scope():
      n = counter[0]
      counter[0] += 1
      return f'fusion/conv2d_{n}' if n else 'fusion/conv2d'

    for i in range(levels - 1):
      num_filters = (k << i) if i < m else (k << m)
      cin_up = aligned_channels(i + 1) if i + 1 == levels - 1 else (
          (k << (i + 1)) if i + 1 < m else (k << m))
      level_convs = [
          _Conv(2, cin_up, num_filters, scope(), activation=None,
                seed=seed + 3 * i),
          _Conv(3, aligned_channels(i) + num_filters, num_filters, scope(),
                seed=seed + 3 * i + 1),
          _Conv(3, num_filters, num_filters, scope(), seed=seed + 3 * i + 2),
      ]
      self.convs.append(level_convs)
    self.output_conv = _Conv(1, self.convs[0][2].kernel.shape[-1], 3,
                             scope(), activation=None, seed=seed + 99)

  def __call__(self, pyramid):
    net = pyramid[-1]
    for i in reversed(range(len(pyramid) - 1)):
      size = tf.shape(pyramid[i])[1:3]
      net = tf.image.resize(net, size,
                            method=tf.image.ResizeMethod.NEAREST_NEIGHBOR)
      net = self.convs[i][0](net)
      net = tf.concat([pyramid[i], net], axis=-1)
      net = self.convs[i][1](net)
      net = self.convs[i][2](net)
    return self.output_conv(net)


def _build_image_pyramid(image, levels):
  pyramid = []
  for i in range(levels):
    pyramid.append(image)
    if i < levels - 1:
      image = _avg_pool(image)
  return pyramid


class OracleFilmNet(tf.Module):
  """Full FILM forward in TF, with reference-style tracked attributes."""

  def __init__(self, opts: Options, seed=0):
    super().__init__()
    self._opts = opts
    feat = _FeatNet(opts, seed=seed)
    flow = _PredictFlow(opts, seed=seed + 10000)
    fuse = _Fusion(opts, seed=seed + 20000)
    # Attribute names matching the Keras checkpoint dependency layout. No
    # other aliases: a second attribute pointing at the same module would
    # change which object-graph path the checkpoint keys use.
    setattr(self, 'layer_with_weights-0', feat)
    setattr(self, 'layer_with_weights-1', flow)
    setattr(self, 'layer_with_weights-2', fuse)

  def __call__(self, inputs, training=False):
    opts = self._opts
    feat = getattr(self, 'layer_with_weights-0')
    flow_net = getattr(self, 'layer_with_weights-1')
    fuse = getattr(self, 'layer_with_weights-2')
    x0, x1, time = inputs['x0'], inputs['x1'], inputs['time']
    image_pyramids = [
        _build_image_pyramid(x0, opts.pyramid_levels),
        _build_image_pyramid(x1, opts.pyramid_levels),
    ]
    feature_pyramids = [feat(image_pyramids[0]), feat(image_pyramids[1])]
    fwd_residual = flow_net(feature_pyramids[0], feature_pyramids[1])
    bwd_residual = flow_net(feature_pyramids[1], feature_pyramids[0])

    def synth(residuals):
      flow = residuals[-1]
      out = [flow]
      for r in reversed(residuals[:-1]):
        size = tf.shape(r)[1:3]
        flow = r + tf.image.resize(2 * flow, size)
        out.append(flow)
      return list(reversed(out))

    levels = opts.fusion_pyramid_levels
    fwd_flow_pyr = synth(fwd_residual)[:levels]
    bwd_flow_pyr = synth(bwd_residual)[:levels]
    mid = tf.ones_like(time) * 0.5
    bwd_flow = [f * mid[:, 0][:, None, None, None] for f in bwd_flow_pyr]
    fwd_flow = [f * (1.0 - mid[:, 0])[:, None, None, None]
                for f in fwd_flow_pyr]
    to_warp = [
        [tf.concat([i, f], axis=-1) for i, f in
         zip(image_pyramids[0][:levels], feature_pyramids[0][:levels])],
        [tf.concat([i, f], axis=-1) for i, f in
         zip(image_pyramids[1][:levels], feature_pyramids[1][:levels])],
    ]
    fwd_warped = [tf_dense_image_warp_backward(p, f)
                  for p, f in zip(to_warp[0], bwd_flow)]
    bwd_warped = [tf_dense_image_warp_backward(p, f)
                  for p, f in zip(to_warp[1], fwd_flow)]
    aligned = [tf.concat([a, b, bf, ff], axis=-1) for a, b, bf, ff in
               zip(fwd_warped, bwd_warped, bwd_flow, fwd_flow)]
    prediction = fuse(aligned)
    return {
        'image': prediction[..., :3],
        'x0_warped': fwd_warped[0][..., :3],
        'x1_warped': bwd_warped[0][..., :3],
    }


def save_oracle_saved_model(model: OracleFilmNet, opts: Options, path: str,
                            height: int, width: int) -> None:
  """Exports a SavedModel with a serving signature, like the reference."""
  spec = {
      'x0': tf.TensorSpec([None, None, None, 3], tf.float32, name='x0'),
      'x1': tf.TensorSpec([None, None, None, 3], tf.float32, name='x1'),
      'time': tf.TensorSpec([None, 1], tf.float32, name='time'),
  }

  @tf.function(input_signature=[spec])
  def serve(inputs):
    return model(inputs)

  tf.saved_model.save(model, path, signatures=serve)


def save_oracle_checkpoint(model: OracleFilmNet, path: str) -> str:
  ckpt = tf.train.Checkpoint(model=model)
  return ckpt.save(path)
