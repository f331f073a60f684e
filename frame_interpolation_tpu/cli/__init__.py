"""Command-line entry points (python -m frame_interpolation_tpu.cli.<name>).

CLI map to the reference (google-research/frame-interpolation):
  interpolate_pair           <- eval/interpolator_test.py
  interpolate_dir            <- eval/interpolator_cli.py
  eval_benchmark             <- eval/eval_cli.py
  train                      <- training/train.py
  build_params               <- training/build_saved_model_cli.py
  create_vimeo90K_tfrecord   <- datasets/create_vimeo90K_tfrecord.py
  create_middlebury_tfrecord <- datasets/create_middlebury_tfrecord.py
  create_ucf101_tfrecord     <- datasets/create_ucf101_tfrecord.py
  create_xiph_tfrecord       <- datasets/create_xiph_tfrecord.py
"""
