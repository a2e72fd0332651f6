"""Placeholder — queries registered in a later wave."""
