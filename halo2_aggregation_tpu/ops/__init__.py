"""TPU compute kernels: batched limb field arithmetic, curve ops, MSM, NTT."""
