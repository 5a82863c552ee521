"""Native runtime pieces (C++ via ctypes) + their Python fallbacks."""
