"""Placeholder for the xm codec — implemented in a later milestone."""

def probe(src):
    return None
