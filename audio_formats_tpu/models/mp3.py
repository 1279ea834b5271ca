"""Placeholder for the mp3 codec — implemented in a later milestone."""

def probe(src):
    return None
