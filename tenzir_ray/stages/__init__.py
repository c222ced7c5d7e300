"""Operator stages: each reference operator as a Dataset → Dataset function."""
