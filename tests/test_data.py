"""Data-plane tests: TFRecord framing, Example codec, pipeline, augmentations.

Wire-format parity is pinned against TensorFlow's encoders in both
directions (we write -> TF reads; TF writes -> we read).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame_interpolation_tpu.data import (augmentations, dataset,
                                          example_proto, records, tfrecord)
from frame_interpolation_tpu.data.builders import triplets

tf = pytest.importorskip('tensorflow')


class TestTFRecord:

  def test_roundtrip_self(self, tmp_path):
    path = str(tmp_path / 'a.tfrecord')
    payloads = [b'hello', b'', b'x' * 10000, bytes(range(256))]
    with tfrecord.TFRecordWriter(path) as w:
      for p in payloads:
        w.write(p)
    assert list(tfrecord.read_records(path)) == payloads

  def test_tf_reads_our_records(self, tmp_path):
    path = str(tmp_path / 'b.tfrecord')
    payloads = [b'alpha', b'beta' * 1000]
    with tfrecord.TFRecordWriter(path) as w:
      for p in payloads:
        w.write(p)
    got = [r.numpy() for r in tf.data.TFRecordDataset(path)]
    assert got == payloads

  def test_we_read_tf_records(self, tmp_path):
    path = str(tmp_path / 'c.tfrecord')
    payloads = [b'one', b'two' * 500]
    with tf.io.TFRecordWriter(path) as w:
      for p in payloads:
        w.write(p)
    assert list(tfrecord.read_records(path, validate=True)) == payloads

  def test_corruption_detected(self, tmp_path):
    path = str(tmp_path / 'd.tfrecord')
    with tfrecord.TFRecordWriter(path) as w:
      w.write(b'payload-data')
    data = bytearray(open(path, 'rb').read())
    data[14] ^= 0xFF  # flip a payload byte
    open(path, 'wb').write(bytes(data))
    with pytest.raises(IOError):
      list(tfrecord.read_records(path, validate=True))

  def test_sharded_filenames(self):
    assert tfrecord.sharded_filenames('f.tfrecord@2') == [
        'f.tfrecord-00000-of-00002', 'f.tfrecord-00001-of-00002']
    assert tfrecord.sharded_filenames('plain.tfrecord') == ['plain.tfrecord']

  def test_crc32c_known_values(self):
    # RFC 3720 test vectors.
    assert tfrecord.crc32c(b'') == 0
    assert tfrecord.crc32c(b'\x00' * 32) == 0x8A9136AA
    assert tfrecord.crc32c(bytes(range(32))) == 0x46DD794E


class TestExampleProto:

  def _sample_features(self):
    return {
        'name': [b'some-bytes', b'more'],
        'height': [256],
        'values': [1.5, -2.25],
    }

  def test_tf_parses_our_encoding(self):
    encoded = example_proto.encode_example(self._sample_features())
    example = tf.train.Example.FromString(encoded)
    feats = example.features.feature
    assert list(feats['name'].bytes_list.value) == [b'some-bytes', b'more']
    assert list(feats['height'].int64_list.value) == [256]
    np.testing.assert_allclose(
        list(feats['values'].float_list.value), [1.5, -2.25])

  def test_we_parse_tf_encoding(self):
    example = tf.train.Example(features=tf.train.Features(feature={
        'name': tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b'some-bytes', b'more'])),
        'height': tf.train.Feature(
            int64_list=tf.train.Int64List(value=[256, -7])),
        'values': tf.train.Feature(
            float_list=tf.train.FloatList(value=[1.5, -2.25])),
    }))
    decoded = example_proto.decode_example(example.SerializeToString())
    assert decoded['name'] == [b'some-bytes', b'more']
    assert decoded['height'] == [256, -7]
    np.testing.assert_allclose(decoded['values'], [1.5, -2.25])

  def test_roundtrip_self(self):
    features = self._sample_features()
    decoded = example_proto.decode_example(
        example_proto.encode_example(features))
    assert decoded['name'] == features['name']
    assert decoded['height'] == features['height']
    np.testing.assert_allclose(decoded['values'], features['values'])


class TestTripletRecords:

  def _triplet(self, seed=0, h=24, w=32):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), np.uint8) for _ in range(3)]

  def test_roundtrip(self):
    frames = self._triplet()
    record = records.make_triplet_example(frames, path='clip/042')
    example = records.parse_triplet_example(record, with_path=True)
    assert example is not None
    assert example['path'] == 'clip/042'
    np.testing.assert_allclose(example['x0'], frames[0] / 255.0, atol=1e-6)
    np.testing.assert_allclose(example['y'], frames[1] / 255.0, atol=1e-6)
    np.testing.assert_allclose(example['x1'], frames[2] / 255.0, atol=1e-6)
    assert example['time'] == np.float32(0.5)

  def test_schema_matches_reference_feature_map(self):
    # The reference parses with FixedLenFeatures named frame_i/* + path
    # (training/data_lib.py:23-53); TF must find those exact keys.
    record = records.make_triplet_example(self._triplet(), path='p')
    feature_map = {
        'frame_0/encoded': tf.io.FixedLenFeature((), tf.string),
        'frame_0/format': tf.io.FixedLenFeature((), tf.string),
        'frame_0/height': tf.io.FixedLenFeature((), tf.int64),
        'frame_0/width': tf.io.FixedLenFeature((), tf.int64),
        'frame_1/encoded': tf.io.FixedLenFeature((), tf.string),
        'frame_2/encoded': tf.io.FixedLenFeature((), tf.string),
        'path': tf.io.FixedLenFeature((), tf.string),
    }
    parsed = tf.io.parse_single_example(record, feature_map)
    assert parsed['frame_0/height'].numpy() == 24
    assert parsed['frame_0/width'].numpy() == 32
    decoded = tf.io.decode_image(parsed['frame_1/encoded'])
    assert decoded.shape == (24, 32, 3)

  def test_parse_skips_incomplete(self):
    record = example_proto.encode_example({'path': [b'x']})
    assert records.parse_triplet_example(record) is None


class TestPipelines:

  def _write_dataset(self, tmp_path, n=6, shards=2, h=20, w=28):
    base = str(tmp_path / 'data.tfrecord')
    writers = [tfrecord.TFRecordWriter(tfrecord.shard_filename(base, i,
                                                               shards))
               for i in range(shards)]
    rng = np.random.RandomState(0)
    for i in range(n):
      frames = [rng.randint(0, 256, (h, w, 3), np.uint8) for _ in range(3)]
      writers[i % shards].write(
          records.make_triplet_example(frames, path=f'ex{i:03d}'))
    for wr in writers:
      wr.close()
    return f'{base}@{shards}'

  def test_eval_dataset_deterministic(self, tmp_path):
    spec = self._write_dataset(tmp_path)
    batches1 = list(dataset.eval_dataset(spec))
    batches2 = list(dataset.eval_dataset(spec))
    assert len(batches1) == 6
    for a, b in zip(batches1, batches2):
      np.testing.assert_array_equal(a['y'], b['y'])
      assert a['path'] == b['path']

  def test_eval_max_examples(self, tmp_path):
    spec = self._write_dataset(tmp_path)
    assert len(list(dataset.eval_dataset(spec, max_examples=3))) == 3
    assert len(list(dataset.eval_dataset(spec, max_examples=-1))) == 6

  def test_training_iterator_shapes_and_crop(self, tmp_path):
    spec = self._write_dataset(tmp_path)
    it = dataset.create_training_iterator(
        [dataset.TrainingSource(spec, crop_size=16)], batch_size=4,
        shuffle_buffer=4, prefetch=0)
    batch = next(it)
    assert batch['x0'].shape == (4, 16, 16, 3)
    assert batch['y'].shape == (4, 16, 16, 3)
    assert batch['time'].shape == (4, 1)

  def test_training_iterator_skips_too_small(self, tmp_path):
    spec = self._write_dataset(tmp_path, h=8, w=8)
    it = dataset.create_training_iterator(
        [dataset.TrainingSource(spec, crop_size=0)], batch_size=2,
        shuffle_buffer=2, prefetch=0)
    batch = next(it)
    assert batch['x0'].shape == (2, 8, 8, 3)


class TestAugmentations:

  def _batch(self, seed=0, n=3, h=12, w=12):
    rng = np.random.RandomState(seed)
    return {
        'x0': jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32)),
        'x1': jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32)),
        'y': jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32)),
    }

  def test_rot90_matches_tf(self):
    x = np.random.RandomState(0).rand(6, 8, 3).astype(np.float32)
    for k in range(4):
      ours = np.asarray(augmentations._rot90_single(jnp.asarray(x), k))
      theirs = tf.image.rot90(x, k=k).numpy()
      np.testing.assert_array_equal(ours, theirs, err_msg=f'k={k}')

  def test_rotate_by_90_matches_rot90(self):
    x = np.random.RandomState(1).rand(9, 9, 2).astype(np.float32)
    rotated = np.asarray(
        augmentations.rotate_image(jnp.asarray(x), jnp.pi / 2))
    expected = tf.image.rot90(x, k=1).numpy()
    np.testing.assert_allclose(rotated, expected, atol=1e-4)

  def test_flow_rot90_counter_rotates_vectors(self):
    # A uniform (1, 0) flow rotated 90deg ccw becomes (0, -1): x-motion
    # becomes upward motion (y is down in image coords).
    flow = np.zeros((4, 4, 2), np.float32)
    flow[..., 0] = 1.0
    out = np.asarray(augmentations.flow_rot90(jnp.asarray(flow), 1))
    np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 1], -1.0, atol=1e-6)

  def test_flow_flip_negates_u(self):
    rng = np.random.RandomState(2)
    flow = rng.rand(5, 7, 2).astype(np.float32)
    out = np.asarray(augmentations.flow_flip(jnp.asarray(flow)))
    np.testing.assert_allclose(out[..., 0], -flow[:, ::-1, 0], atol=1e-6)
    np.testing.assert_allclose(out[..., 1], flow[:, ::-1, 1], atol=1e-6)

  def test_apply_preserves_shapes_and_consistency(self):
    batch = self._batch()
    fns = augmentations.data_augmentations(
        ['random_image_rot90', 'random_flip', 'random_rotate',
         'random_reverse'])
    out = augmentations.apply_data_augmentation(
        fns, jax.random.PRNGKey(0), batch)
    for key in ('x0', 'x1', 'y'):
      assert out[key].shape == batch[key].shape
      assert np.isfinite(np.asarray(out[key])).all()

  def test_same_key_is_deterministic(self):
    batch = self._batch()
    fns = augmentations.data_augmentations(['random_image_rot90',
                                            'random_flip'])
    out1 = augmentations.apply_data_augmentation(
        fns, jax.random.PRNGKey(7), batch)
    out2 = augmentations.apply_data_augmentation(
        fns, jax.random.PRNGKey(7), batch)
    np.testing.assert_array_equal(np.asarray(out1['y']),
                                  np.asarray(out2['y']))

  def test_unknown_name_raises(self):
    with pytest.raises(AttributeError):
      augmentations.data_augmentations(['nope'])


class TestBuilders:

  def test_resize_local_mean_matches_box_mean_for_integer_factor(self):
    rng = np.random.RandomState(0)
    x = rng.rand(8, 12, 3)
    out = triplets.resize_local_mean(x, 4, 6)
    expected = x.reshape(4, 2, 6, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expected, atol=1e-12)

  def test_generate_triplet_example(self, tmp_path):
    rng = np.random.RandomState(1)
    paths = {}
    for key in ('frame_0', 'frame_1', 'frame_2'):
      p = str(tmp_path / f'{key}.png')
      from PIL import Image
      Image.fromarray(rng.randint(0, 256, (16, 20, 3), np.uint8)).save(p)
      paths[key] = p
    record = triplets.generate_image_triplet_example(paths)
    example = records.parse_triplet_example(record, with_path=True)
    assert example is not None
    assert example['x0'].shape == (16, 20, 3)

  def test_generate_with_scale_and_crop(self, tmp_path):
    rng = np.random.RandomState(2)
    paths = {}
    from PIL import Image
    for key in ('frame_0', 'frame_1', 'frame_2'):
      p = str(tmp_path / f'{key}.png')
      Image.fromarray(rng.randint(0, 256, (32, 40, 3), np.uint8)).save(p)
      paths[key] = p
    record = triplets.generate_image_triplet_example(
        paths, scale_factor=2, center_crop_factor=2)
    example = records.parse_triplet_example(record)
    # center-crop /2 -> (16, 20), then downscale /2 -> (8, 10).
    assert example['y'].shape == (8, 10, 3)

  def test_generate_missing_file_returns_none(self, tmp_path):
    paths = {f'frame_{i}': str(tmp_path / f'missing{i}.png')
             for i in range(3)}
    assert triplets.generate_image_triplet_example(paths) is None

  def test_run_pipeline_writes_shards(self, tmp_path):
    rng = np.random.RandomState(3)
    from PIL import Image
    triplet_dicts = []
    for n in range(5):
      d = {}
      for key in ('frame_0', 'frame_1', 'frame_2'):
        p = str(tmp_path / f'{n}_{key}.png')
        Image.fromarray(rng.randint(0, 256, (8, 8, 3), np.uint8)).save(p)
        d[key] = p
      triplet_dicts.append(d)
    out = str(tmp_path / 'out.tfrecord')
    written = triplets.run_pipeline(triplet_dicts, out, num_shards=2)
    assert written == 5
    got = list(tfrecord.read_sharded(f'{out}@2'))
    assert len(got) == 5
