"""cld_tpu — TPU-native controllable latent diffusion for traffic simulation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
RoboSafe-Lab/Controllable-Latent-Diffusion-for-Traffic-Simulation (reference
mounted at /root/reference): a three-stage pipeline

  1. LSTM conditional VAE over 5.2 s state+action trajectories,
  2. latent DDPM (100-step cosine schedule, 1-D temporal UNet denoiser),
  3. PPO fine-tuning of the denoiser on offroad/collision/comfort rewards,

plus test-time guidance, an on-device closed-loop simulator, and eval metrics.

Everything under `jit`: the denoising loop, the PPO update loop, and the
closed-loop simulation loop are `lax.scan`s; scaling is `jax.sharding.Mesh` +
sharded batch dims (DP) with XLA collectives over ICI.
"""

__version__ = "0.1.0"
