"""(placeholder — filled in a later milestone this round)"""
