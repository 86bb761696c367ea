"""Compute ops: cv2-parity kernels in jnp + Pallas (color, template
match, morphology, components, angles)."""
