"""TPU compute path: vectorised JAX/Pallas ops for the VDL-M2 pipeline."""
