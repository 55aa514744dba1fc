"""Training / evaluation / demo orchestration."""
