"""Neural networks (flax.linen): map encoder, context encoder, LSTM-VAE,
temporal UNet denoiser."""

from cld_tpu.models.nets import MLP, SinusoidalPosEmb, Conv1dBlock, mish
from cld_tpu.models.resnet import ResNetEncoder
from cld_tpu.models.lstm import LSTMVAE, LSTMEncoder, LSTMDecoder
from cld_tpu.models.temporal_unet import TemporalMapUnet
from cld_tpu.models.context import ContextEncoder
