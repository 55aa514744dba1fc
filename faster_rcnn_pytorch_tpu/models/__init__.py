"""Model zoo: backbones, RPN, heads, target assignment, full detectors."""
