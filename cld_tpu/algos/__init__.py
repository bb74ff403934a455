"""Algorithm layer: functional DDPM training/sampling, PPO, guidance hooks."""

from cld_tpu.algos.dm import dm_loss, sample_traj, transition_log_prob
