#!/bin/bash
# Build the C++ reference (bwvdnbro/CMacIonize, mounted read-only at
# /root/reference) into /tmp/cmi_build for side-by-side benchmark
# comparisons (benchmarks/compare_reference.py, benchmarks/RESULTS.md).
#
# Two deviations from a stock build, both required by this environment:
#  1. dummy archives for the four atmosphere-spectrum data files that are
#     absent from the mounted reference (wmbasic/pegase3/PopStar/
#     CastelliKurucz — none are used by the stromgren/lexington/starbench/
#     bondi benchmark runs; their readers are never constructed);
#  2. a validation patch extending AsciiFileDensityGridWriter's classic
#     overload with temperature + ionic-fraction columns
#     (T, xHe, xO, xOp, xCp, xN) so the multi-element comparison harness
#     can read the reference's state without HDF5.
set -e

SRC=/tmp/cmi_src
BUILD=/tmp/cmi_build
rm -rf "$SRC" "$BUILD"
cp -r /root/reference "$SRC"
chmod -R u+w "$SRC"

for f in wmbasic.tar.gz pegase3_chab.tar.gz PopStar.tar.gz; do
  [ -f "$SRC/data/$f" ] || tar -czf "$SRC/data/$f" -T /dev/null
done
[ -f "$SRC/data/CastelliKurucz.hdf5" ] || : > "$SRC/data/CastelliKurucz.hdf5"

python3 - "$SRC" <<'EOF'
import sys

src = sys.argv[1] + "/src/AsciiFileDensityGridWriter.cpp"
text = open(src).read()
old = """    file << x.x() << "\\t" << x.y() << "\\t" << x.z() << "\\t" << n << "\\t"
         << volume << "\\t" << frac << "\\n";
  }
}

/**
 * @brief Write a snapshot for a split grid."""
new = """    file << x.x() << "\\t" << x.y() << "\\t" << x.z() << "\\t" << n << "\\t"
         << volume << "\\t" << frac << "\\t"
         << it.get_ionization_variables().get_temperature() << "\\t"
         << it.get_ionization_variables().get_ionic_fraction(ION_He_n) << "\\t"
         << it.get_ionization_variables().get_ionic_fraction(ION_O_n) << "\\t"
         << it.get_ionization_variables().get_ionic_fraction(ION_O_p1) << "\\t"
         << it.get_ionization_variables().get_ionic_fraction(ION_C_p1) << "\\t"
         << it.get_ionization_variables().get_ionic_fraction(ION_N_n) << "\\n";
  }
}

/**
 * @brief Write a snapshot for a split grid."""
assert old in text, "AsciiFileDensityGridWriter patch anchor not found"
text = text.replace(old, new)

# same extension for the split-grid (task-based) overload
old2 = """      const double volume = cellit.get_volume();
      file << x.x() << "\\t" << x.y() << "\\t" << x.z() << "\\t" << n << "\\t"
           << volume << "\\t" << xH << "\\n";"""
new2 = """      const double volume = cellit.get_volume();
      file << x.x() << "\\t" << x.y() << "\\t" << x.z() << "\\t" << n << "\\t"
           << volume << "\\t" << xH << "\\t"
           << cellit.get_ionization_variables().get_temperature() << "\\t"
           << cellit.get_ionization_variables().get_ionic_fraction(ION_He_n) << "\\t"
           << cellit.get_ionization_variables().get_ionic_fraction(ION_O_n) << "\\t"
           << cellit.get_ionization_variables().get_ionic_fraction(ION_O_p1) << "\\t"
           << cellit.get_ionization_variables().get_ionic_fraction(ION_C_p1) << "\\t"
           << cellit.get_ionization_variables().get_ionic_fraction(ION_N_n) << "\\n";"""
assert old2 in text, "split-grid ascii patch anchor not found"
text = text.replace(old2, new2)

# velocity columns on the classic overload (bondi comparison needs the
# hydro state; appended AFTER the ionization extras so existing readers
# keep their column indices).  RHD grids store hydro in INTERNAL units
# (InternalHydroUnits) — convert to SI like the Gadget writer does.
old3 = """         << it.get_ionization_variables().get_ionic_fraction(ION_N_n) << "\\n";
  }
}"""
new3 = """         << it.get_ionization_variables().get_ionic_fraction(ION_N_n) << "\\t"
         << v_SI.x() << "\\t" << v_SI.y() << "\\t" << v_SI.z() << "\\n";
  }
}"""
assert old3 in text, "velocity ascii patch anchor not found"
text = text.replace(old3, new3, 1)
old4 = """    double n = it.get_ionization_variables().get_number_density();"""
new4 = """    CoordinateVector<> v_SI =
        it.get_hydro_variables().get_primitives_velocity();
    if (hydro_units != nullptr) {
      v_SI = hydro_units->convert_to_SI_units< QUANTITY_VELOCITY >(v_SI);
    }
    double n = it.get_ionization_variables().get_number_density();"""
assert old4 in text, "velocity conversion anchor not found"
text = text.replace(old4, new4, 1)
text = text.replace(
    '#include "DensityGrid.hpp"',
    '#include "DensityGrid.hpp"\n#include "InternalHydroUnits.hpp"', 1)
open(src, "w").write(text)
print("patched", src)
EOF

# the mounted reference is not a git checkout; CMake derives its version
# string from `git describe`, so give the copy a tagged throwaway history
if [ ! -d "$SRC/.git" ]; then
  (cd "$SRC" && git init -q && git add -A &&
   git -c user.email=build@local -c user.name=build commit -qm "build copy" &&
   git tag v2.0)
fi

mkdir -p "$BUILD"
cd "$BUILD"
cmake "$SRC" -DCMAKE_BUILD_TYPE=Release >/dev/null
make -j"$(nproc)" CMacIonize 2>&1 | tail -3
echo "reference binary: $BUILD/rundir/CMacIonize"
