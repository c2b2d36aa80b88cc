"""Data, simulation, statistics, and post-analysis utilities."""
