"""Multi-chip scaling: device meshes, shardings, halo-exchange collectives."""
