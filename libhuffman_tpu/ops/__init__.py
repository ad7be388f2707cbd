"""Compute kernels: host-exact reference semantics and their TPU (JAX/Pallas)
counterparts."""
