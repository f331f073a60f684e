"""Tests: the reference's actual gin files load into our configs 1:1."""
import os

import pytest

from frame_interpolation_tpu.training.configs import gin_compat

_REF = '/root/reference'
needs_reference = pytest.mark.skipif(not os.path.isdir(_REF),
                                     reason='reference checkout not present')


@needs_reference
class TestReferenceGinFiles:

  def test_film_net_l1(self):
    config = gin_compat.load_training_gin(
        f'{_REF}/training/config/film_net-L1.gin')
    assert config.model.pyramid_levels == 7
    assert config.model.flow_filters == (32, 64, 128, 256)
    assert config.learning_rate == 0.0001
    assert config.learning_rate_decay_rate == 0.464158
    assert config.num_steps == 3000000
    assert config.dataset.batch_size == 8
    assert config.dataset.crop_size == 256
    assert config.training_losses.names == ('l1',)
    assert config.test_losses.names == ('l1', 'psnr', 'ssim')
    assert config.augmentations == ('random_image_rot90', 'random_flip',
                                    'random_rotate', 'random_reverse')

  def test_film_net_style_schedules(self):
    config = gin_compat.load_training_gin(
        f'{_REF}/training/config/film_net-Style.gin',
        vgg_model_file='weights.mat')
    assert config.training_losses.names == ('l1', 'vgg', 'style')
    l1_s, vgg_s, style_s = config.training_losses.weight_schedules
    assert float(l1_s(0)) == 1.0 and float(l1_s(2000000)) == 1.0
    assert float(vgg_s(0)) == 1.0 and float(vgg_s(1500001)) == 0.25
    assert float(style_s(0)) == 0.0 and float(style_s(1500001)) == 40.0

  def test_style_uses_gin_vgg_path_when_not_overridden(self):
    config = gin_compat.load_training_gin(
        f'{_REF}/training/config/film_net-Style.gin')
    assert config.vgg_model_file.endswith('imagenet-vgg-verydeep-19.mat')

  def test_all_eval_gins(self):
    names = {'middlebury': 'middlebury', 'vimeo_90K': 'vimeo_90K',
             'ucf101': 'ucf101', 'xiph_2K': 'xiph_2K', 'xiph_4K': 'xiph_4K'}
    for filename, expected in names.items():
      config = gin_compat.load_eval_gin(
          f'{_REF}/eval/config/{filename}.gin')
      assert config.name == expected
      assert config.metrics == ('l1', 'l2', 'ssim', 'psnr')
      assert config.tfrecord


class TestParser:

  def test_multiline_lists_and_comments(self, tmp_path):
    path = str(tmp_path / 'x.gin')
    open(path, 'w').write(
        "# comment\nfoo.bar = [1,\n  2, 3]  # trailing\n"
        "foo.name = 'abc'\nfoo.flag = True\n")
    bindings = gin_compat.parse_gin_bindings(path)
    assert bindings == {'foo.bar': [1, 2, 3], 'foo.name': 'abc',
                        'foo.flag': True}

  def test_multi_source_weights_parsed(self, tmp_path):
    """training_dataset.weights must reach DatasetConfig (sampling mix)."""
    path = str(tmp_path / 'multi.gin')
    open(path, 'w').write(
        "training_dataset.files = ['a.tfrecord@2', 'b.tfrecord@2']\n"
        "training_dataset.crop_sizes = [256, 256]\n"
        "training_dataset.weights = [0.75, 0.25]\n")
    config = gin_compat.load_training_gin(path)
    assert config.dataset.files == ('a.tfrecord@2', 'b.tfrecord@2')
    assert config.dataset.weights == (0.75, 0.25)

  def test_unknown_binding_rejected(self, tmp_path):
    path = str(tmp_path / 'bad.gin')
    open(path, 'w').write("training.learning_rate = 1e-4\nwho.knows = 3\n")
    with pytest.raises(ValueError):
      gin_compat.load_training_gin(path)
