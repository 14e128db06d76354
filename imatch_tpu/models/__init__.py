"""Model zoo: CLIP family, U^2-Net, Moondream-class VLM — pure JAX."""
