"""pyskani_tpu — TPU-native ANI engine (skani method, JAX/Pallas)."""
__version__ = "0.1.0"
