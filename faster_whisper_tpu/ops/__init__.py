"""TPU compute kernels (JAX/XLA/Pallas) for the Whisper stack."""
