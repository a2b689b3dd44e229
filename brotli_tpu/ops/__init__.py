"""JAX/Pallas device kernels: batched decode, bit packing, hashing, histograms."""
