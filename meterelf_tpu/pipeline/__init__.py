"""The batched decode graph and its host driver."""
