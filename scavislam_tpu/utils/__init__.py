"""Utilities: config system, performance monitor, logging."""
