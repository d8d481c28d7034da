"""Multimodal payload handling: binary columns + typed metadata."""
