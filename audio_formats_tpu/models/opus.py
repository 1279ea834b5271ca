"""Placeholder for the opus codec — implemented in a later milestone."""

def probe(src):
    return None
