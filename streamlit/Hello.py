"""Streamlit entry page (parity: reference streamlit/Hello.py).

streamlit is an optional dependency (not installed in the build image — use
``webui/app.py`` there); these pages serve environments that have it.

    streamlit run streamlit/Hello.py
"""
import streamlit as st

st.set_page_config(page_title="dmtpu", page_icon="🌀")
st.title("dmtpu — TPU-native diffusion sampling")
st.markdown(
    """
Select a page from the sidebar:

1. **Unconditional Image Generation** — any sampler / variance / respacing
2. **Class-conditional (CFG)** — guidance-scale controlled sampling
3. **Stable Diffusion** — text-to-image with positive/negative prompts

Configure checkpoints via environment variables (see each page).
"""
)
