"""L5 training: losses, fused GAN step, data pipeline, trainer CLI."""

from .losses import discriminator_loss, feature_loss, generator_loss, kl_loss
from .step import (
    GanTrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
