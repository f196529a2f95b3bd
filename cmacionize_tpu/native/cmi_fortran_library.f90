! Fortran interface for the cmacionize_tpu C library API.
!
! iso_c_binding declarations mirroring the reference's Fortran shim
! (/root/reference/fortran/cmi_fortran_library.f90): link a Fortran host
! code against libcmi_tpu.so (built by cmacionize_tpu.native.build_cmi)
! and call the same cmi_* entry points the C API exposes.  The image used
! for development carries no Fortran compiler, so this module is shipped
! declaration-only and compile-validated wherever gfortran exists (the
! interfaces are plain iso_c_binding over the C ABI in cmi_c_library.h).

module cmi_fortran_library

  use, intrinsic :: iso_c_binding

  interface

    subroutine cmi_init_periodic_dp(parameter_file, num_thread, &
        unit_length_in_SI, unit_mass_in_SI, box_anchor, box_sides, &
        mapping_type, talk) bind(c, name = "cmi_init_periodic_dp")
      use, intrinsic :: iso_c_binding
      character(kind=c_char), dimension(*), intent(in) :: parameter_file
      integer(c_int), value :: num_thread
      real(c_double), value :: unit_length_in_SI
      real(c_double), value :: unit_mass_in_SI
      real(c_double), dimension(3), intent(in) :: box_anchor
      real(c_double), dimension(3), intent(in) :: box_sides
      character(kind=c_char), dimension(*), intent(in) :: mapping_type
      integer(c_int), value :: talk
    end subroutine cmi_init_periodic_dp

    subroutine cmi_init(parameter_file, num_thread, unit_length_in_SI, &
        unit_mass_in_SI, mapping_type, talk) bind(c, name = "cmi_init")
      use, intrinsic :: iso_c_binding
      character(kind=c_char), dimension(*), intent(in) :: parameter_file
      integer(c_int), value :: num_thread
      real(c_double), value :: unit_length_in_SI
      real(c_double), value :: unit_mass_in_SI
      character(kind=c_char), dimension(*), intent(in) :: mapping_type
      integer(c_int), value :: talk
    end subroutine cmi_init

    subroutine cmi_destroy() bind(c, name = "cmi_destroy")
    end subroutine cmi_destroy

    subroutine cmi_compute_neutral_fraction_dp(x, y, z, h, m, nH, N) &
        bind(c, name = "cmi_compute_neutral_fraction_dp")
      use, intrinsic :: iso_c_binding
      real(c_double), dimension(*), intent(in) :: x, y, z, h, m
      real(c_double), dimension(*), intent(inout) :: nH
      integer(c_size_t), value :: N
    end subroutine cmi_compute_neutral_fraction_dp

    subroutine cmi_compute_neutral_fraction_sp(x, y, z, h, m, nH, N) &
        bind(c, name = "cmi_compute_neutral_fraction_sp")
      use, intrinsic :: iso_c_binding
      real(c_float), dimension(*), intent(in) :: x, y, z, h, m
      real(c_float), dimension(*), intent(inout) :: nH
      integer(c_size_t), value :: N
    end subroutine cmi_compute_neutral_fraction_sp

  end interface

end module cmi_fortran_library
