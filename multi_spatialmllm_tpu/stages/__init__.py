"""L3 stages: derived spatial indices computed as batched TPU programs."""
