"""Placeholder for the QOA codec — implemented in the next milestone."""


def probe(src):
    return None


QoaEncoder = None
