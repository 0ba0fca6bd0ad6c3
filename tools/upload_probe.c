/* dump reference upload conversions for parity testing */
#include <stdio.h>
#include <stdlib.h>
#include "audiality2.h"
#include "a2_waves.h"

int main(void)
{
    A2_config *cfg = a2_OpenConfig(44100, 4096, 1, A2_TIMESTAMP | A2_AUTOCLOSE);
    a2_AddDriver(cfg, a2_NewDriver(A2_AUDIODRIVER, "buffer"));
    A2_interface *iface = a2_Open(cfg);
    srand(1234);
    enum { N = 256 };
    static int8_t i8[N]; static int16_t i16[N];
    static int32_t i24[N], i32v[N]; static float f32[N];
    for(int s = 0; s < N; ++s)
    {
        i8[s] = (int8_t)(rand() & 0xff);
        i16[s] = (int16_t)(rand() & 0xffff);
        i24[s] = (rand() ^ (rand() << 12)) & 0xffffff; i24[s] -= 1 << 23;
        i32v[s] = rand() ^ (rand() << 16);
        f32[s] = (float)((rand() / (double)RAND_MAX) * 2.2 - 1.1);
    }
    struct { const char *n; A2_sampleformats f; const void *d; unsigned bytes; } T[] = {
        {"I8", A2_I8, i8, N}, {"I16", A2_I16, i16, N*2},
        {"I24", A2_I24, i24, N*4}, {"I32", A2_I32, i32v, N*4},
        {"F32", A2_F32, f32, N*4},
    };
    /* dump the raw inputs so python uses identical data */
    FILE *f = fopen("/tmp/upconv_in.bin", "wb");
    fwrite(i8, 1, N, f); fwrite(i16, 2, N, f);
    fwrite(i24, 4, N, f); fwrite(i32v, 4, N, f); fwrite(f32, 4, N, f);
    fclose(f);
    f = fopen("/tmp/upconv_out.bin", "wb");
    for(int t = 0; t < 5; ++t)
    {
        /* flat wave (no mipmaps) so data[0] is the raw conversion */
        A2_handle h = a2_UploadWave(iface, A2_WWAVE, 0, 0,
                T[t].f, T[t].d, T[t].bytes);
        A2_wave *w = a2_GetWave(iface, h);
        fwrite(w->d.wave.data[0] + 1, 2, N, f);   /* skip A2_WAVEPRE */
        a2_Release(iface, h);
        /* gain 0.5 via a stream write path? a2_UploadWave has no gain;
           use normalize off; skip gain variant for API parity */
    }
    fclose(f);
    a2_Close(iface);
    printf("ok\n");
    return 0;
}
