"""On-device generation: beam search, sampling, logits processors."""
