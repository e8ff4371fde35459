"""Dataset IO: synthetic renderer, disk sequence grabbers, dump tools."""
