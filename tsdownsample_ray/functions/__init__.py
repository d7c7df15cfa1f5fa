"""Pure functions: codecs, hashing, bucketing."""
