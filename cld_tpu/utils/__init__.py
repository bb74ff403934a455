"""Config system, pytree helpers, timers."""

from cld_tpu.utils.config import Config, load_config, default_config
