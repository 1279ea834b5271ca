"""Placeholder for the flac codec — implemented in a later milestone."""

def probe(src):
    return None
