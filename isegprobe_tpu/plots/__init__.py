"""Plotting scripts."""
