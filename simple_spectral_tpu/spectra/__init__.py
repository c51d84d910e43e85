from simple_spectral_tpu.spectra.spectrum import (
    Spectrum,
    SpectrumTable,
    load_spectral_csv,
    sample_linear,
    sample_nearest,
    hero_wavelengths,
    sample_hero,
)

__all__ = [
    "Spectrum",
    "SpectrumTable",
    "load_spectral_csv",
    "sample_linear",
    "sample_nearest",
    "hero_wavelengths",
    "sample_hero",
]
