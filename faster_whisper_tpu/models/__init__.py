"""Whisper model family: configs, JAX forward passes, weight loading."""
