"""Device kernels (XLA + Pallas): image preprocessing, stereo, features."""
