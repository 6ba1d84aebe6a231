"""Pipeline stage plans — the engine's equivalents of the reference's five
stages (Connector/Fixer/Augmenter/Broadcaster/Emailer + recon Lambda), each a
declarative DataFrame plan composed from operators/ and functions/.
"""
