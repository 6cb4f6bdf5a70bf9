"""GUI layer: streamlit web app and shared plot-script generation."""
