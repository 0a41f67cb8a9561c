from setuptools import find_packages, setup

setup(
    name="ngspeciesid-tpu",
    version="0.1.0",
    description="TPU-native amplicon species-ID engine (clustering + consensus + polishing)",
    packages=find_packages(exclude=("tests", "tests.*")),
    package_data={"ngspeciesid_tpu": ["data/*.npz"]},
    python_requires=">=3.10",
    install_requires=["numpy", "jax"],
    entry_points={
        "console_scripts": [
            "NGSpeciesID-tpu=ngspeciesid_tpu.cli:main_and_exit",
        ]
    },
)
