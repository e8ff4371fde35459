"""CLI entry points: stereo_slam, create_dictionary, dump_sequence."""
