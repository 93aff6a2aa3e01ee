"""Bench/trace tools."""
