"""Placeholder for the mod codec — implemented in a later milestone."""

def probe(src):
    return None
