"""Command-line entry points: train, decode, dev_streamer, experiment GUI,
marker listener, evaluation experiments."""
