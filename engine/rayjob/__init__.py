"""Distributed layer: Ray Data pipelines over the pdfcore extraction kernel."""
