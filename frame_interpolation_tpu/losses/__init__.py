"""Losses: L1/L2/SSIM/PSNR, warped-L1, VGG19 perceptual, Gram style."""

from .losses import (LossConfig, PiecewiseConstantSchedule,
                     aggregate_batch_losses, compute_weighted_loss,
                     constant_schedule, create_losses, get_loss, l1_loss,
                     l1_warped_loss, l2_loss, make_style_loss, make_vgg_loss,
                     psnr_loss, ssim_loss, test_losses, training_losses)
from .vgg19 import style_loss, vgg_features, vgg_loss

__all__ = [
    'LossConfig', 'PiecewiseConstantSchedule', 'aggregate_batch_losses',
    'compute_weighted_loss', 'constant_schedule', 'create_losses', 'get_loss',
    'l1_loss', 'l1_warped_loss', 'l2_loss', 'make_style_loss',
    'make_vgg_loss', 'psnr_loss', 'ssim_loss', 'style_loss', 'test_losses',
    'training_losses', 'vgg_features', 'vgg_loss',
]
